"""sk_gs_tpu — a TPU-native (JAX/XLA/Pallas) framework for dynamic Gaussian
Splatting with superpoint clustering and automatic skeleton discovery.

Re-designed from scratch for TPU with the capabilities of the reference
SK-GS implementation (dnvtmf/SK_GS: SP-GS, ICML 2024 + SK-GS, NeurIPS 2024):

- ``ops``       pure-JAX math core: quaternions, SE3/SO3, spherical harmonics,
                camera/coordinate transforms, encoders, MLPs, KNN/FPS.
- ``render``    differentiable tile rasterizer: vectorized preprocess,
                XLA-sort tile binning, Pallas per-tile blend kernels with a
                custom VJP, plus a pure-jnp per-pixel oracle renderer.
- ``models``    GaussianSplatting / SP-GS / SK-GS model families as pytrees +
                pure functions (capacity-padded static shapes).
- ``data``      D-NeRF / WIM / ZJU-MoCap / colmap scene loaders (device-resident).
- ``framework`` config (YAML + __base__ inheritance + CLI), registry, staged
                training loop, checkpointing, metrics, logging.
- ``parallel``  multi-chip sharding: Gaussian-sharded preprocess + tile-sharded
                blend over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
