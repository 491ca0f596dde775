import sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent.parent))
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent.parent / 'tests'))
from sk_gs_tpu.render import GaussianInputs, RasterConfig, composite_background, render
import tests.test_render as tr

rng = np.random.default_rng(0)
g = tr.build_inputs(rng, 300)
view = tr.make_view()
cfg_x = tr.CFG._replace(use_pallas=False)
cfg_p = tr.CFG._replace(use_pallas=True)
out_x = jax.jit(lambda g: render(g, view, cfg_x))(g)
out_p = jax.jit(lambda g: render(g, view, cfg_p))(g)
di = float(jnp.abs(out_x['images'] - out_p['images']).max())
da = float(jnp.abs(out_x['opacity'] - out_p['opacity']).max())
print("fwd max diff: img", di, "alpha", da)

tgt = jnp.asarray(rng.uniform(size=(48,64,3)).astype(np.float32))
def loss(g, cfg):
    out = render(g, view, cfg)
    img = composite_background(out['images'], out['opacity'], jnp.ones(3))
    return jnp.mean(jnp.abs(img - tgt)) + 0.1*jnp.mean(out['opacity'])
gx = jax.jit(jax.grad(lambda m,s,r,o,sh: loss(GaussianInputs(m,s,r,o,sh=sh), cfg_x), argnums=(0,1,2,3,4)))(g.means3d, g.scales, g.rotations, g.opacities, g.sh)
gp = jax.jit(jax.grad(lambda m,s,r,o,sh: loss(GaussianInputs(m,s,r,o,sh=sh), cfg_p), argnums=(0,1,2,3,4)))(g.means3d, g.scales, g.rotations, g.opacities, g.sh)
for a, b, nm in zip(gx, gp, ['means','scales','rots','opa','sh']):
    scale = float(jnp.abs(a).max()) + 1e-12
    d = float(jnp.abs(a-b).max())/scale
    print(f"grad {nm}: rel diff {d:.2e}")
    assert d < 1e-3, nm
print("TPU pallas == XLA path: OK")
