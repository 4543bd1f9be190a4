"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest

from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
from falcon_genome_tpu.parallel.sharded import (
    germline_train_step, make_example_batch, sharded_bqsr_histogram,
    sharded_pairhmm_step)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    assert len(d) >= 8, "conftest must force 8 virtual CPU devices"
    return d[:8]


class TestMesh:
    def test_mesh_shapes(self, devices):
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        assert mesh.shape == {"data": 4, "region": 2}
        mesh1 = make_mesh(MeshSpec(data=-1, region=2), devices)
        assert mesh1.shape == {"data": 4, "region": 2}

    def test_bad_factorization_raises(self, devices):
        with pytest.raises(ValueError):
            make_mesh(MeshSpec(data=3, region=2), devices)


class TestShardedSteps:
    def test_pairhmm_matches_single_device(self, devices):
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        R, H, B = 16, 24, 64
        args = make_example_batch(B, R, H, n_cov=8)[:8]
        step = sharded_pairhmm_step(mesh, R, H)
        sharded = np.asarray(step(*args))
        from falcon_genome_tpu.parallel.sharded import _pairhmm_math
        import jax.numpy as jnp
        local = np.asarray(_pairhmm_math(
            *[jnp.asarray(a) for a in args[:7]], jnp.asarray(args[7]),
            R, H))
        np.testing.assert_allclose(sharded, local, atol=1e-5)

    def test_bqsr_histogram_reduction(self, devices):
        mesh = make_mesh(MeshSpec(data=8, region=1), devices)
        n = 8 * 100
        rng = np.random.default_rng(1)
        rg = np.zeros(n, np.int32)
        qual = rng.integers(0, 40, n).astype(np.int32)
        cyc = rng.integers(0, 100, n).astype(np.int32)
        ctx = rng.integers(0, 16, n).astype(np.int32)
        err = (rng.random(n) < 0.1).astype(np.float32)
        step = sharded_bqsr_histogram(mesh)
        obs, errs, ctx_obs = step(rg, qual, cyc, ctx, err)
        assert float(np.asarray(obs).sum()) == n
        assert float(np.asarray(errs).sum()) == err.sum()
        assert float(np.asarray(ctx_obs).sum()) == n

    def test_germline_train_step(self, devices):
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        R, H = 16, 24
        B, n_cov = 64, 512
        step = germline_train_step(mesh, R, H)
        args = make_example_batch(B, R, H, n_cov)
        logp, hist = step(*args)
        assert logp.shape == (B,)
        assert np.isfinite(np.asarray(logp)).all()
        assert float(np.asarray(hist).sum()) == n_cov


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (args[0].shape[1],)

    def test_dryrun_multichip(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestDistributedSort:
    def test_global_sort_matches_numpy(self, rng):
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import distributed_sort
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        # coordinate-sort keys: pos<<24 | read idx (payload rides along)
        n = 4096 + 37                      # non-divisible by device count
        pos = rng.integers(0, 1 << 32, n).astype(np.uint64)
        keys = (pos << np.uint64(24)) | np.arange(n, dtype=np.uint64)
        got = distributed_sort(mesh, keys, axis_name="data")
        assert np.array_equal(got, np.sort(keys))

    def test_skewed_keys_overflow_retry(self, rng):
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import distributed_sort
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        # heavily skewed: 90% of keys identical → bucket overflow path
        n = 2048
        keys = np.full(n, 42, np.uint64)
        keys[: n // 10] = rng.integers(0, 1 << 40, n // 10).astype(np.uint64)
        got = distributed_sort(mesh, keys, axis_name="data",
                               capacity_factor=1.1)
        assert np.array_equal(got, np.sort(keys))
