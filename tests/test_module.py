import dataclasses
import pickle

import jax
import jax.numpy as jnp
import pytest

from tinygp_tpu.utils import Module, static_field


class Affine(Module):
    weight: jax.Array
    bias: jax.Array
    name: str = static_field(default="affine")

    def __call__(self, x):
        return self.weight * x + self.bias


class WithCustomInit(Module):
    scaled: jax.Array
    flag: bool = static_field(default=False)

    def __init__(self, raw, flag=False):
        self._init(scaled=2.0 * jnp.asarray(raw), flag=flag)


def test_flatten_roundtrip():
    m = Affine(weight=jnp.ones(3), bias=jnp.zeros(3))
    leaves, treedef = jax.tree_util.tree_flatten(m)
    assert len(leaves) == 2
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(m2, Affine)
    assert m2.name == "affine"


def test_static_field_is_metadata():
    m1 = Affine(weight=jnp.ones(3), bias=jnp.zeros(3), name="a")
    m2 = Affine(weight=jnp.ones(3), bias=jnp.zeros(3), name="b")
    t1 = jax.tree_util.tree_structure(m1)
    t2 = jax.tree_util.tree_structure(m2)
    assert t1 != t2


def test_jit_through_module():
    m = Affine(weight=jnp.full(3, 2.0), bias=jnp.ones(3))

    @jax.jit
    def apply(mod, x):
        return mod(x)

    out = apply(m, jnp.arange(3.0))
    assert jnp.allclose(out, 2.0 * jnp.arange(3.0) + 1.0)


def test_grad_through_module():
    m = Affine(weight=jnp.full((), 2.0), bias=jnp.full((), 1.0))
    g = jax.grad(lambda mod: mod(3.0))(m)
    assert jnp.allclose(g.weight, 3.0)
    assert jnp.allclose(g.bias, 1.0)


def test_custom_init_not_rerun_on_unflatten():
    m = WithCustomInit(3.0)
    assert jnp.allclose(m.scaled, 6.0)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    # If __init__ re-ran, scaled would be doubled again.
    assert jnp.allclose(m2.scaled, 6.0)


def test_frozen():
    m = Affine(weight=jnp.ones(3), bias=jnp.zeros(3))
    with pytest.raises(dataclasses.FrozenInstanceError):
        m.weight = jnp.zeros(3)


def test_vmap_over_module_params():
    ms = Affine(weight=jnp.arange(4.0), bias=jnp.zeros(4))
    out = jax.vmap(lambda mod: mod(1.0))(ms)
    assert jnp.allclose(out, jnp.arange(4.0))


def test_key_paths():
    m = Affine(weight=jnp.ones(3), bias=jnp.zeros(3))
    paths = [
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(m)[0]
    ]
    assert any("weight" in p for p in paths)
    assert any("bias" in p for p in paths)
