// Native joint discovery: MST over the joint-cost matrix + leaf-peeling
// root selection + binary-lifting parents table.
//
// TPU-native equivalent of the reference CUDA/CPU helper
// (/root/reference/my_ext/_C/src/nerf/sp_gs_joint.cu:55-85 and the python
// fallback networks/sk_gs.py:50-131). Host-side: M ~ 512, O(M^2 log M),
// called every joint_update_interval steps between device steps.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O2 -shared -fPIC -o libjoint.so joint_discovery.cpp

#include <algorithm>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct DSU {
  std::vector<int> parent;
  explicit DSU(int n) : parent(n) {
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int find(int x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  bool unite(int a, int b) {
    a = find(a);
    b = find(b);
    if (a == b) return false;
    parent[a] = b;
    return true;
  }
};

}  // namespace

extern "C" {

// cost: [m*m] row-major; alive: [m] uint8; outputs:
//   parents: [m*max_levels] int32, depth: [m] int32, root: [1] int32
// Returns 0 on success.
int joint_discovery(const float* cost, const uint8_t* alive, int m,
                    int max_levels, int32_t* parents, int32_t* depth,
                    int32_t* root_out) {
  std::vector<int> alive_idx;
  alive_idx.reserve(m);
  for (int i = 0; i < m; ++i)
    if (alive[i]) alive_idx.push_back(i);
  const int k = static_cast<int>(alive_idx.size());

  std::memset(depth, 0, sizeof(int32_t) * m);
  if (k == 0) {
    for (int i = 0; i < m * max_levels; ++i) parents[i] = 0;
    *root_out = 0;
    return 0;
  }
  if (k == 1) {
    for (int i = 0; i < m * max_levels; ++i) parents[i] = alive_idx[0];
    *root_out = alive_idx[0];
    return 0;
  }

  // Kruskal over sorted finite edges of the alive sub-block.
  struct Edge {
    float w;
    int a, b;
  };
  std::vector<Edge> edges;
  edges.reserve(static_cast<size_t>(k) * (k - 1));
  for (int ia = 0; ia < k; ++ia) {
    for (int ib = 0; ib < k; ++ib) {
      if (ia == ib) continue;
      const float w = cost[alive_idx[ia] * m + alive_idx[ib]];
      if (std::isfinite(w)) edges.push_back({w, ia, ib});
    }
  }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& x, const Edge& y) { return x.w < y.w; });

  DSU dsu(k);
  std::vector<std::vector<int>> adj(k);
  int used = 0;
  for (const Edge& e : edges) {
    if (used == k - 1) break;
    if (dsu.unite(e.a, e.b)) {
      adj[e.a].push_back(e.b);
      adj[e.b].push_back(e.a);
      ++used;
    }
  }

  // Leaf peeling to find a depth-minimizing root (find_root parity).
  std::vector<int> deg(k);
  std::vector<int64_t> visited(k, 0);
  for (int i = 0; i < k; ++i) deg[i] = static_cast<int>(adj[i].size());
  std::vector<int> que;
  que.reserve(k);
  for (int i = 0; i < k; ++i)
    if (deg[i] <= 1) {
      que.push_back(i);
      visited[i] = 1;
    }
  for (size_t qi = 0; qi < que.size(); ++qi) {
    const int now = que[qi];
    for (int nxt : adj[now]) {
      if (deg[nxt] > 1) {
        if (--deg[nxt] == 1) que.push_back(nxt);
        visited[nxt] = std::max(visited[nxt], visited[now] + 1);
      }
    }
  }
  const int root_local = que.empty() ? 0 : que.back();

  // BFS from root: direct parents + depths.
  std::vector<int32_t> par(k, root_local);
  std::vector<int32_t> dep(k, 0);
  std::vector<uint8_t> seen(k, 0);
  std::queue<int> bfs;
  bfs.push(root_local);
  seen[root_local] = 1;
  while (!bfs.empty()) {
    const int now = bfs.front();
    bfs.pop();
    for (int nxt : adj[now]) {
      if (!seen[nxt]) {
        seen[nxt] = 1;
        par[nxt] = now;
        dep[nxt] = dep[now] + 1;
        bfs.push(nxt);
      }
    }
  }

  const int root = alive_idx[root_local];
  for (int i = 0; i < m; ++i)
    for (int l = 0; l < max_levels; ++l) parents[i * max_levels + l] = root;
  for (int i = 0; i < k; ++i) {
    parents[alive_idx[i] * max_levels + 0] = alive_idx[par[i]];
    depth[alive_idx[i]] = dep[i];
  }
  for (int l = 1; l < max_levels; ++l)
    for (int i = 0; i < m; ++i)
      parents[i * max_levels + l] =
          parents[parents[i * max_levels + l - 1] * max_levels + l - 1];
  *root_out = root;
  return 0;
}

}  // extern "C"
