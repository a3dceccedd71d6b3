"""Run-coalescing gather: exactness vs plain src[idx] (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cilantro_tpu.core.coalesced import NSEGB, coalesced_gather

SEG = 8  # segment rows at width 16


C = 8 * NSEGB * 2          # two grid steps' worth of pool rows
W = 16


@pytest.fixture(scope="module")
def src():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((C, W)).astype(np.float32))


def check(src, idx):
    idx = jnp.asarray(np.asarray(idx, np.int32))
    out = coalesced_gather(src, idx, interpret=True)
    ref = src[jnp.clip(idx, 0, C - 1)]
    valid = np.asarray(idx) >= 0
    np.testing.assert_array_equal(
        np.asarray(out)[valid], np.asarray(ref)[valid]
    )


class TestCoalescedGather:
    def test_contiguous_runs(self, src):
        n = SEG * NSEGB
        idx = (np.arange(n) * 1 + 37) % (C - SEG)
        check(src, idx)

    def test_jittered_runs(self, src):
        rng = np.random.default_rng(1)
        n = SEG * NSEGB
        base = np.arange(n) % (C - 16)
        idx = base + rng.integers(0, 3, n)  # small forward jitter
        check(src, idx)

    def test_fully_random(self, src):
        rng = np.random.default_rng(2)
        idx = rng.integers(0, C, SEG * NSEGB)
        check(src, idx)

    def test_wildcards_mixed(self, src):
        rng = np.random.default_rng(3)
        n = SEG * NSEGB
        idx = (np.arange(n) + 11) % (C - SEG)
        kill = rng.random(n) < 0.3
        idx[kill] = -1
        check(src, idx)

    def test_boundary_segments(self, src):
        n = SEG * NSEGB
        idx = np.full(n, C - 1)
        idx[: n // 2] = np.arange(n // 2) % 3  # low rows
        check(src, idx)

    def test_unpadded_length(self, src):
        # N not a multiple of the block: padding path.
        idx = (np.arange(SEG * NSEGB + 123) + 5) % (C - SEG)
        check(src, idx)

    def test_width8_kernel_path(self):
        rng = np.random.default_rng(4)
        c8 = 16 * NSEGB * 2
        s8 = jnp.asarray(rng.standard_normal((c8, 8)).astype(np.float32))
        n = 16 * NSEGB
        idx = (np.arange(n) + 7) % (c8 - 16)
        idx[rng.random(n) < 0.05] = -1
        idx2 = idx.copy()
        idx2[rng.random(n) < 0.02] = rng.integers(0, c8)
        for stream in (idx, idx2):
            stream = jnp.asarray(np.asarray(stream, np.int32))
            out = coalesced_gather(s8, stream, interpret=True)
            ref = s8[jnp.clip(stream, 0, c8 - 1)]
            valid = np.asarray(stream) >= 0
            np.testing.assert_array_equal(
                np.asarray(out)[valid], np.asarray(ref)[valid]
            )

    def test_tiny_pool_falls_back(self):
        # C < 2*seg rows cannot host the (2, 128) window unit; must take
        # the plain-gather path instead of issuing a negative-offset DMA.
        rng = np.random.default_rng(6)
        for c, w in ((8, 16), (8, 8), (16, 16)):
            s = jnp.asarray(rng.standard_normal((c, w)).astype(np.float32))
            idx = jnp.asarray(
                np.asarray(rng.integers(0, c, 300), np.int32))
            out = coalesced_gather(s, idx, interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(s[idx]))

    def test_odd_width_falls_back(self):
        s3 = jnp.asarray(np.random.default_rng(5)
                         .standard_normal((256, 3)).astype(np.float32))
        idx = jnp.asarray(np.arange(64, dtype=np.int32))
        out = coalesced_gather(s3, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(s3[idx]))
