"""Framework tests: config system, checkpointing, PLY IO, parallel step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.framework import config as cfg_mod
from sk_gs_tpu.framework.checkpoint import (CheckpointManager, load_into_pytree,
                                            save_pytree)
from sk_gs_tpu.utils.ply import load_gaussian_ply, save_gaussian_ply


class TestConfig:
    def test_base_inheritance_and_merge(self, tmp_path):
        (tmp_path / 'base.yaml').write_text(
            'a: 1\nnested: {x: 1, y: 2}\nlist: [1, 2]\n')
        (tmp_path / 'child.yaml').write_text(
            '__base__: base.yaml\nnested: {y: 3, z: 4}\nb: 2\n')
        cfg = cfg_mod.load_yaml(tmp_path / 'child.yaml')
        assert cfg == {'a': 1, 'b': 2, 'nested': {'x': 1, 'y': 3, 'z': 4},
                       'list': [1, 2]}

    def test_replace_marker(self, tmp_path):
        (tmp_path / 'base.yaml').write_text('nested: {x: 1, y: 2}\n')
        (tmp_path / 'child.yaml').write_text(
            '__base__: base.yaml\nnested: {__replace__: true, z: 9}\n')
        cfg = cfg_mod.load_yaml(tmp_path / 'child.yaml')
        assert cfg['nested'] == {'__replace__': True, 'z': 9}

    def test_multi_base(self, tmp_path):
        (tmp_path / 'a.yaml').write_text('a: 1\nshared: a\n')
        (tmp_path / 'b.yaml').write_text('b: 2\nshared: b\n')
        (tmp_path / 'c.yaml').write_text('__base__: [a.yaml, b.yaml]\nc: 3\n')
        cfg = cfg_mod.load_yaml(tmp_path / 'c.yaml')
        assert cfg == {'a': 1, 'b': 2, 'c': 3, 'shared': 'b'}

    def test_cli_overrides(self):
        cfg = cfg_mod.apply_overrides(
            {'train': {'lr': 0.1}},
            ['train.lr=0.5', 'model.caps=[1,2]', 'name=hello'])
        assert cfg['train']['lr'] == 0.5
        assert cfg['model']['caps'] == [1, 2]
        assert cfg['name'] == 'hello'


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {'a': jnp.ones((3, 2)), 'b': {'c': jnp.arange(5)},
                'list': [jnp.zeros(2), jnp.ones(2)]}
        save_pytree(tree, tmp_path / 'x.npz')
        tree2 = load_into_pytree(jax.tree.map(jnp.zeros_like, tree),
                                 tmp_path / 'x.npz')
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(tree2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_manager_rotation_and_resume(self, tmp_path):
        mgr = CheckpointManager(tmp_path, interval=2, max_keep=2)
        state = {'w': jnp.zeros(3)}
        for step in range(1, 9):
            mgr.save({'w': jnp.full(3, float(step))}, step)
        files = sorted(tmp_path.glob('checkpoint_*.npz'))
        assert len(files) == 2  # max_keep
        assert mgr.latest_step() == 8
        loaded = mgr.load(state)
        np.testing.assert_allclose(np.asarray(loaded['state']['w']), 8.0)
        assert int(loaded['meta']['step']) == 8


class TestPly:
    def test_roundtrip(self, tmp_path, rng):
        n, cap = 20, 32
        params = {
            'xyz': rng.normal(size=(cap, 3)).astype(np.float32),
            'f_dc': rng.normal(size=(cap, 1, 3)).astype(np.float32),
            'f_rest': rng.normal(size=(cap, 15, 3)).astype(np.float32),
            'opacity': rng.normal(size=(cap, 1)).astype(np.float32),
            'scaling': rng.normal(size=(cap, 3)).astype(np.float32),
            'rotation': rng.normal(size=(cap, 4)).astype(np.float32),
        }
        alive = np.arange(cap) < n
        save_gaussian_ply(tmp_path / 'm.ply', params, alive)
        out = load_gaussian_ply(tmp_path / 'm.ply')
        for k in params:
            np.testing.assert_allclose(out[k], params[k][:n], atol=1e-6,
                                       err_msg=k)


class TestParallel:
    def test_dryrun_8_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (32, 32, 3)
        assert bool(jnp.isfinite(out).all())
