"""Multi-chip sharding tests on the 8-device CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.parallel import mesh as meshlib


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = meshlib.make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == (meshlib.FOLD_AXIS, meshlib.DATA_AXIS)

    def test_make_mesh_fold_by_data(self):
        mesh = meshlib.make_mesh(n_data=2, n_fold=4)
        assert mesh.devices.shape == (4, 2)

    def test_make_mesh_too_many_raises(self):
        with pytest.raises(ValueError):
            meshlib.make_mesh(n_data=16, n_fold=1)

    def test_batch_sharding_distributes(self):
        mesh = meshlib.make_mesh(n_data=8)
        x = np.arange(8 * 4, dtype=np.float32).reshape(8, 2, 2, 1)
        xs = meshlib.put_batch(x, mesh)
        assert len(xs.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xs), x)

    def test_replicated_gradient_psum(self):
        """A jitted grad over batch-sharded data must equal the single-device
        grad — XLA inserts the reduction from shardings alone."""
        mesh = meshlib.make_mesh(n_data=8)
        w = jnp.ones((4,))
        x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_single = jax.grad(loss)(w, jnp.asarray(x))
        xs = meshlib.put_batch(x, mesh)
        ws = meshlib.put_replicated(w, mesh)
        g_sharded = jax.jit(jax.grad(loss))(ws, xs)
        np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded), rtol=1e-6)


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_multichip_2(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(2)
