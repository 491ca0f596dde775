"""Deformation networks: per-Gaussian warp field and skeleton joint net.

Parity targets:
- ``DeformNetwork`` (/root/reference/networks/sk_gs.py:209-317): freq-encoded
  (x, t) -> trunk D=8 W=256 with skip at D//2 (concat [x_emb, t_emb, h]);
  blender variant feeds t through a 2-layer timenet -> 30 dims; heads
  gaussian_warp(3) / gaussian_scaling(3) / gaussian_rotation(4) and optional
  local_rotation(4) under sep_rot; tiny-std head init (:280-294).
- ``SimpleDeformationNetwork`` (:134-164): MLP_with_skips on [enc(p), enc(t)]
  with multi-head output [R_dim, 4, 3]; heads re-initialized to std 1e-6
  (:542-545).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.encoders import FreqEncoder
from ..ops import mlp as mlp_ops


class DeformNetConfig(NamedTuple):
    depth: int = 8
    width: int = 256
    pos_degree: int = 10
    t_degree: int = 6
    is_blender: bool = True
    sep_rot: bool = False
    max_d_scale: float = -1.0
    time_out: int = 30
    # 'bfloat16' = mixed precision: master params stay f32 (optimizer, exact
    # adds), the net COMPUTES in bf16 and returns f32. The TPU analogue of
    # the reference's AMP fp16 path (my_ext/framework.py:264-306) — no loss
    # scaler needed (bf16 shares the f32 exponent range).
    compute_dtype: str = 'float32'

    @property
    def skips(self) -> Tuple[int, ...]:
        return (self.depth // 2,)

    @property
    def pos_enc(self) -> FreqEncoder:
        return FreqEncoder(input_dim=3, degree=self.pos_degree)

    @property
    def t_enc(self) -> FreqEncoder:
        return FreqEncoder(input_dim=1, degree=self.t_degree)


def _kaiming_linear(key, fan_in, fan_out, dtype=jnp.float32):
    """kaiming_uniform fan_in relu + zero bias (sk_gs.py:285-287)."""
    bound = np.sqrt(6.0 / fan_in)
    w = jax.random.uniform(key, (fan_in, fan_out), dtype, -bound, bound)
    return {'w': w, 'b': jnp.zeros((fan_out,), dtype)}


def _small_linear(key, fan_in, fan_out, std, dtype=jnp.float32):
    w = jax.random.normal(key, (fan_in, fan_out), dtype) * std
    return {'w': w, 'b': jnp.zeros((fan_out,), dtype)}


def deform_net_init(key, cfg: DeformNetConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.depth + 8)
    p_dim = cfg.pos_enc.output_dim
    t_dim = cfg.t_enc.output_dim if not cfg.is_blender else cfg.time_out
    in_dim = p_dim + t_dim

    params: Dict[str, Any] = {}
    if cfg.is_blender:
        params['timenet'] = [
            _kaiming_linear(keys[-1], cfg.t_enc.output_dim, 256),
            _kaiming_linear(keys[-2], 256, cfg.time_out),
        ]
    trunk = []
    cin = in_dim
    for i in range(cfg.depth):
        trunk.append(_kaiming_linear(keys[i], cin, cfg.width))
        cin = cfg.width + (in_dim if i in cfg.skips else 0)
    params['trunk'] = trunk
    params['warp'] = _small_linear(keys[-3], cin, 3, 1e-5)
    params['scaling'] = _small_linear(keys[-4], cin, 3, 1e-8)
    params['rotation'] = _small_linear(keys[-5], cin, 4, 1e-5)
    if cfg.sep_rot:
        params['local_rotation'] = _small_linear(keys[-6], cin, 4, 1e-4)
    return params


def deform_net_apply(params: Dict[str, Any], cfg: DeformNetConfig,
                     x: jnp.ndarray, t: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """x [N, 3], t scalar or [N, 1] -> dict of deltas.

    Note the reference timenet has NO trailing activation on its last layer
    (nn.Sequential Linear-ReLU-Linear, sk_gs.py:250-253).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32:
        params = jax.tree.map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
    t = jnp.broadcast_to(jnp.reshape(t, (-1, 1)), (x.shape[0], 1))
    # frequency encoding stays f32: sin(x * 2^k) needs full input mantissa
    # (bf16 x would give O(1) phase error at the top octaves); the MLP
    # trunk computes in compute_dtype
    t_emb = cfg.t_enc(t).astype(dt)
    if cfg.is_blender:
        h = jax.nn.relu(mlp_ops.linear_apply(params['timenet'][0], t_emb))
        t_emb = mlp_ops.linear_apply(params['timenet'][1], h)
    x_emb = cfg.pos_enc(x).astype(dt)
    inp = jnp.concatenate([x_emb, t_emb], axis=-1)
    h = inp
    for i, layer in enumerate(params['trunk']):
        h = jax.nn.relu(mlp_ops.linear_apply(layer, h))
        if i in cfg.skips:
            h = jnp.concatenate([x_emb, t_emb, h], axis=-1)
    d_xyz = mlp_ops.linear_apply(params['warp'], h)
    scaling = mlp_ops.linear_apply(params['scaling'], h)
    rotation = mlp_ops.linear_apply(params['rotation'], h)
    if cfg.max_d_scale > 0:
        scaling = jnp.tanh(scaling) * np.log(cfg.max_d_scale)
    out = {'d_xyz': d_xyz, 'd_rotation': rotation, 'd_scaling': scaling,
           'hidden': h}
    if 'local_rotation' in params:
        out['g_rotation'] = mlp_ops.linear_apply(params['local_rotation'], h)
    if dt != jnp.float32:
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
    return out


# ---------------------------------------------------------------- skeleton net

class SkeletonNetConfig(NamedTuple):
    out_dims: Tuple[int, ...] = (4, 4, 3)  # (R_dim, d_rot, d_scale)
    width: int = 256
    depth: int = 8
    skips: Tuple[int, ...] = (4,)
    pos_degree: int = 10
    t_degree: int = 6
    p_in_channels: int = 3
    compute_dtype: str = 'float32'  # see DeformNetConfig.compute_dtype

    @property
    def pos_enc(self) -> FreqEncoder:
        return FreqEncoder(input_dim=self.p_in_channels, degree=self.pos_degree)

    @property
    def t_enc(self) -> FreqEncoder:
        return FreqEncoder(input_dim=1, degree=self.t_degree)


def skeleton_net_init(key, cfg: SkeletonNetConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params = mlp_ops.mlp_init(
        k1, cfg.pos_enc.output_dim + cfg.t_enc.output_dim, cfg.width,
        cfg.depth, out_channels=list(cfg.out_dims), skips=cfg.skips)
    # tiny-std head re-init (sk_gs.py:542-545)
    return mlp_ops.mlp_head_reinit_small(params, k2, std=1e-6)


def skeleton_net_apply(params: Dict[str, Any], cfg: SkeletonNetConfig,
                       joints: jnp.ndarray, t: jnp.ndarray):
    """joints [M, C] + scalar t -> tuple of per-joint outputs (R, d_rot, d_scale)."""
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32:
        params = jax.tree.map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
    t = jnp.broadcast_to(jnp.reshape(t, (-1, 1)), (joints.shape[0], 1))
    # encoders f32 (see deform_net_apply), trunk in compute_dtype
    inp = jnp.concatenate([cfg.pos_enc(joints), cfg.t_enc(t)],
                          axis=-1).astype(dt)
    outs = mlp_ops.mlp_apply(params, inp, skips=cfg.skips, multi_head=True)
    if dt != jnp.float32:
        outs = tuple(o.astype(jnp.float32) for o in outs)
    return outs
