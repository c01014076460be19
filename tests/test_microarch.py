"""Micro-arch suite smoke tests (CPU interpret mode): every bench runs at
tiny sizes and emits well-formed JSON — the regression harness contract
(VERDICT r1 #7; reference analog: lib/gpu/*_testsuite executables)."""

import json

import numpy as np

import pytest

from libhpc_tpu.bench import microarch


def run_capture(capsys, fn, *args, **kw):
    fn(*args, **kw)
    lines = [json.loads(line)
             for line in capsys.readouterr().out.strip().splitlines()]
    assert lines, "bench emitted no JSON"
    for d in lines:
        assert "bench" in d and "error" not in d, d
    return lines


def test_gather_row_width(capsys):
    lines = run_capture(capsys, microarch.bench_gather_row_width,
                        n_rows=256, m=256)
    assert {d["b"] for d in lines} == {1, 8, 16, 128}
    assert all(d["g_rows_per_s"] > 0 for d in lines)


def test_scatter_modes(capsys):
    lines = run_capture(capsys, microarch.bench_scatter_modes, n=4096)
    assert {d["mode"] for d in lines} == {
        "scatter_add_dup", "scatter_perm", "gather_perm", "segment_sum"}


def test_lane_shuffle(capsys):
    lines = run_capture(capsys, microarch.bench_lane_shuffle,
                        S=8, n_tiles=2)
    assert lines[0]["g_gathers_per_s"] > 0


def test_dma_gather(capsys):
    lines = run_capture(capsys, microarch.bench_dma_gather,
                        n_table=16, n_gather=32, R=8, G=8)
    assert lines[0]["g_descriptors_per_s"] > 0


def test_roll_vs_reshape(capsys):
    lines = run_capture(capsys, microarch.bench_roll_vs_reshape, rows=8)
    assert {d["variant"] for d in lines} == {"roll", "reshape"}


@pytest.mark.parametrize("name", list(microarch.ALL))
def test_registry_complete(name):
    assert callable(microarch.ALL[name])


def test_overlap_chip_kernel(rng):
    """Correctness of the single-chip DMA/compute overlap sweep kernel
    (bench/overlap_chip.py) in interpret mode."""
    import jax.numpy as jnp

    from libhpc_tpu.bench.overlap_chip import _sweep_step, ROWS, LANE

    x = jnp.asarray(rng.standard_normal((2 * ROWS, LANE)).astype(np.float32))
    out = np.asarray(_sweep_step(x, 2))
    xn = np.asarray(x)
    for s in range(2):
        blk = xn[s * ROWS:(s + 1) * ROWS]
        acc = blk.copy()
        for _ in range(2):
            acc = acc * 1.000001 + blk
        expect = acc.reshape(ROWS // 8, 8, LANE).sum(axis=0)
        np.testing.assert_allclose(out[s * 8:(s + 1) * 8], expect,
                                   rtol=1e-3, atol=1e-3)
