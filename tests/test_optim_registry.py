"""Optimizer registry (sgd/adamw/adan) + LR schedule registry — parity with
the reference's OPTIMIZERS (/root/reference/my_ext/optimizer/) and
_lr_methods (/root/reference/my_ext/lr_scheduler.py:27-143)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.framework.lr_schedules import LR_SCHEDULES, lr_multiplier
from sk_gs_tpu.models import optim


def quad_problem():
    """Minimize ||p - target||^2 per leaf."""
    target = {'a': jnp.asarray([1.0, -2.0, 3.0]),
              'b': jnp.asarray([[0.5, -0.5]])}
    params = jax.tree.map(jnp.zeros_like, target)
    def grad_fn(p):
        return jax.tree.map(lambda x, t: 2.0 * (x - t), p, target)
    return params, target, grad_fn


class TestOptimizers:
    @pytest.mark.parametrize('name', ['adam', 'adamw', 'sgd', 'adan'])
    def test_converges_on_quadratic(self, name):
        init_fn, update_fn = optim.make_optimizer(name)
        params, target, grad_fn = quad_problem()
        state = init_fn(params)
        lr = jax.tree.map(lambda _: 0.05, params)

        @jax.jit
        def step(params, state):
            return update_fn(grad_fn(params), state, params, lr)

        for _ in range(400):
            params, state = step(params, state)
        err = max(float(jnp.abs(a - b).max())
                  for a, b in zip(jax.tree.leaves(params),
                                  jax.tree.leaves(target)))
        assert err < 0.05, f'{name} err={err}'

    def test_zero_lr_freezes_leaf(self):
        init_fn, update_fn = optim.make_optimizer('sgd')
        params, target, grad_fn = quad_problem()
        state = init_fn(params)
        lr = {'a': 0.1, 'b': 0.0}
        for _ in range(10):
            params, state = update_fn(grad_fn(params), state, params, lr)
        assert float(jnp.abs(params['b']).max()) == 0.0
        assert float(jnp.abs(params['a']).max()) > 0.0

    def test_adamw_decays_weights(self):
        # zero grads: adamw still shrinks params, adam leaves them alone
        params = {'a': jnp.ones(4)}
        grads = {'a': jnp.zeros(4)}
        lr = {'a': 0.1}
        _, adamw = optim.make_optimizer('adamw')
        _, adam = optim.make_optimizer('adam')
        st = optim.adam_init(params)
        pw, _ = adamw(grads, st, params, lr, weight_decay=0.1)
        pa, _ = adam(grads, st, params, lr)
        assert float(pw['a'][0]) < 1.0
        assert np.isclose(float(pa['a'][0]), 1.0)

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            optim.make_optimizer('lbfgs')


class TestLRSchedules:
    def test_registry_contents(self):
        assert {'fix', 'step', 'exp', 'exp2', 'poly', 'cos',
                'triangle'} <= set(LR_SCHEDULES)

    def test_shapes_and_endpoints(self):
        assert np.isclose(float(lr_multiplier('fix', 123)), 1.0)
        assert np.isclose(float(lr_multiplier('step', 2500, step_size=1000,
                                              gamma=0.1)), 0.01)
        assert np.isclose(float(lr_multiplier('poly', 0)), 1.0)
        assert np.isclose(float(lr_multiplier('cos', 0)), 1.0)
        assert np.isclose(float(lr_multiplier('cos', 30000)), 0.0, atol=1e-6)
        assert np.isclose(float(lr_multiplier('exp2', 30000,
                                              final_mult=0.01)), 0.01)
        # triangle peaks mid-period
        mid = float(lr_multiplier('triangle', 1000, period=2000, low=0.1))
        assert np.isclose(mid, 1.0)

    def test_traced_under_jit(self):
        @jax.jit
        def f(s):
            return lr_multiplier('cos', s, max_steps=100)
        assert np.isclose(float(f(50)), 0.5)

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            lr_multiplier('nope', 0)
