"""Pallas pack kernel vs the portable XLA packer: same contract.

The kernel (models/pack_kernel.py) and the lax.scan fallback
(models/lossless.py::_pack_buffers_xla) must produce identical
per-chunk word buffers and bit counts — the host splice and therefore
the bitstream depend on it. Runs the kernel in interpreter mode on CPU;
the same test runs compiled when a TPU is attached.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _random_code(rng):
    """A structurally plausible canonical-prefix-style LUT: lengths in
    [1, 15], bits < 2^len (exact canonicity is irrelevant to packing)."""
    lens = rng.integers(1, 16, 96).astype(np.int32)
    bits = (rng.integers(0, 1 << 30, 96).astype(np.uint32)
            & ((np.uint32(1) << lens.astype(np.uint32)) - 1))
    code_bits = np.zeros(256, np.uint32)
    code_len = np.zeros(256, np.int32)
    code_bits[:96] = bits
    code_len[:96] = lens
    return code_bits, code_len


@pytest.mark.parametrize("bits", [8, 16])
def test_pack_kernel_matches_xla(bits):
    from libjxl_tpu.models.lossless import _pack_buffers_xla
    from libjxl_tpu.models.pack_kernel import CB, T, pack_chunks_tpu

    rng = np.random.default_rng(42 + bits)
    cn = CB  # one grid step
    n = cn * T
    hi = (1 << 12) if bits == 8 else (1 << 19) - 1
    v = np.minimum(rng.geometric(0.2, n) - 1, hi).astype(np.uint32)
    # sprinkle invalid suffixes like image-border chunks have
    valid = np.ones(n, bool)
    valid[T // 2:T] = False          # chunk 0: valid prefix only
    valid[(cn - 1) * T:] = False     # last chunk: fully invalid
    code_bits, code_len = _random_code(rng)

    buf_x, cb_x = _pack_buffers_xla(
        jnp.asarray(np.where(valid, v, 0)), jnp.asarray(valid),
        jnp.asarray(code_bits), jnp.asarray(code_len))

    sent = np.uint32(0xFFFFFFFF)
    vs = np.where(valid, v, sent).reshape(cn, T)
    lut_comb = ((code_len.astype(np.int64) << 16)
                | code_bits.astype(np.int64)).astype(np.int32)[:96]
    interpret = jax.default_backend() != "tpu"
    buf_k, cb_k = pack_chunks_tpu(
        jnp.asarray(vs), jnp.asarray(lut_comb), interpret=interpret)

    np.testing.assert_array_equal(np.asarray(cb_k), np.asarray(cb_x))
    np.testing.assert_array_equal(np.asarray(buf_k), np.asarray(buf_x))


def test_chunk_pack_device_dense_layout():
    """chunk_pack_device's dense stream: every chunk starts 8-word
    aligned and carries exactly its chunk_bits payload."""
    from libjxl_tpu.models.lossless import chunk_pack_device

    rng = np.random.default_rng(7)
    n = 4 * 128
    v = np.minimum(rng.geometric(0.3, n) - 1, 4000).astype(np.uint16)
    valid = np.ones(n, bool)
    code_bits, code_len = _random_code(rng)
    dense, cb = chunk_pack_device(
        jnp.asarray(v), jnp.asarray(valid), jnp.asarray(code_bits),
        jnp.asarray(code_len), cap_words=1 << 12)
    cb = np.asarray(cb).astype(np.int64)
    nw = ((cb + 31) >> 5 + np.int64(0))
    nw_pad = (nw + 7) & ~np.int64(7)
    ws = np.concatenate([[0], np.cumsum(nw_pad)])
    dense = np.asarray(dense)
    # bits beyond each chunk's payload up to its row padding are zero
    for c in range(len(cb)):
        seg = dense[ws[c]:ws[c] + nw_pad[c]]
        used_words = (cb[c] + 31) >> 5
        assert not seg[used_words:].any()
        tail_bits = int(cb[c]) & 31
        if used_words and tail_bits:
            assert (int(seg[used_words - 1]) >> tail_bits) == 0
