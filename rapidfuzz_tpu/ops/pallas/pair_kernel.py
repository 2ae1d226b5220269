"""Pallas TPU kernel: banded uniform Levenshtein for ONE long pair.

The reference computes arbitrarily long pairs in its Ukkonen-banded block
kernel (``/root/reference/src/distance/levenshtein.rs:769-1019``; the
106,514-char OCR pair with distance 5,278 is its proof fixture,
``:2139-2161``).  This is the TPU rendering for the long-pair case the
one-vs-many kernels cannot take (both strings far beyond register-state
word counts):

* the diagonal band lives as ``R*128`` u32 words laid out row-major on a
  ``[R, 128]`` tile (``R*4096`` band bits, cutoff up to ``R*2048 - 1``);
* the per-char PM window (the band slides one bit per text char) is
  PRECOMPUTED by an XLA prepass as a ``[lb, R, 128]`` stream — each
  window bit column is one shifted compare of the two strings, so the
  prepass is pure dense vector work (no gathers, no funnel shifts in the
  kernel);
* the kernel streams the PM tiles through a text-chunk grid dimension
  (state in VMEM scratch, same pattern as :mod:`stream_kernel`) and runs
  the banded Myers step (``hyrroe2003_small_band_with_pm``,
  ``levenshtein.rs:509-617``, generalized from one machine word to a
  multi-word big integer):
  - the ``(x & vp) + vp`` add propagates carries across words via a
    log-depth carry-lookahead scan (generate/propagate over lane+row
    rolls);
  - the band-slide ``d0 >> 1`` borrows bit 0 of the next word (one roll);
  - the distance delta accumulates per word and collapses with one sum
    at the end (each step contributes at exactly one word).

A score-hint ladder (``levenshtein.rs:1069-1088``) escalates R until the
result is certified (``dist <= cutoff_eff``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 8              # sublane tile height; band rows R <= ROWS
CHUNK = 512           # text chars per grid step ([CHUNK, 8, 128] u32 = 2 MB)


# ------------------------------------------------------------- prepass

@functools.partial(jax.jit, static_argnames=("R", "lb_pad"))
def build_band_stream(a_pad: jnp.ndarray, b: jnp.ndarray, *, R: int,
                      lb_pad: int) -> jnp.ndarray:
    """[lb_pad, ROWS, LANE] u32 PM window stream.

    Window bit ``k`` of text char ``j`` is ``b[j] == a[j + K + 1 - B + k]``
    (``B = R*4096`` band bits, top bit = pattern position ``j + K``).
    ``a_pad`` is the pattern pre-padded so ``a_pad[j + k]`` is that
    element (sentinel -1 outside; inputs are vocab-remapped to >= 0).
    Each k-column is a length-``lb_pad`` compare of ``b`` against one
    slice of ``a_pad`` — dense shifted compares only.
    """
    def word(_, w):
        bits = jnp.zeros(b.shape, jnp.uint32)
        for t in range(32):
            av = lax.dynamic_slice(a_pad, [w * 32 + t], [lb_pad])
            bits = bits | ((b == av).astype(jnp.uint32) << t)
        return _, bits

    _, cols = lax.scan(word, 0, jnp.arange(R * LANE) * 1)
    st = jnp.transpose(cols, (1, 0)).reshape(lb_pad, R, LANE)
    if R < ROWS:
        st = jnp.pad(st, ((0, 0), (0, ROWS - R), (0, 0)))
    return st


# -------------------------------------------------------------- kernel

def _kernel(scal_ref, pm_ref, out_ref, vp_ref, vn_ref, dist_ref, *,
            R: int, nchunks: int):
    la = scal_ref[0]
    lb = scal_ref[1]
    K = scal_ref[2]
    B = R * 4096
    j0 = pl.program_id(0) * CHUNK

    rows = lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 1)
    widx = rows * LANE + lanes                 # global word index
    valid = widx < R * LANE
    nbits = widx * 32                          # first bit index of word
    ones = jnp.full((ROWS, LANE), 0xFFFFFFFF, jnp.uint32)
    zero = jnp.zeros((ROWS, LANE), jnp.uint32)

    def shift_words_up(x, sh, fill):
        """value of word (widx - sh); ``fill`` below word sh."""
        sl = sh % LANE
        y = x
        if sh >= LANE:
            y = pltpu.roll(y, sh // LANE, 0)
        if sl:
            a = pltpu.roll(y, sl, 1)
            b2 = pltpu.roll(pltpu.roll(y, 1, 0), sl, 1)
            y = jnp.where(lanes >= sl, a, b2)
        return jnp.where(widx >= sh, y, fill)

    def next_word(x, fill):
        """value of word (widx + 1); ``fill`` at the last band word."""
        a = pltpu.roll(x, LANE - 1, 1)
        b2 = pltpu.roll(pltpu.roll(x, ROWS - 1, 0), LANE - 1, 1)
        y = jnp.where(lanes < LANE - 1, a, b2)
        return jnp.where(widx < R * LANE - 1, y, fill)

    def big_and_add(x, vp):
        """(x & vp) + vp over the B-bit band (carry-lookahead).

        Carry generate/propagate ride as u32 0/1 words, not bools —
        Mosaic's ``tpu.dynamic_rotate`` (pltpu.roll) has no i1 lowering
        ("Rotate with non-32-bit data").
        """
        av = x & vp
        s0 = av + vp
        g = ((s0 < av) & valid).astype(jnp.uint32)    # word carry generate
        p = ((s0 == ones) & valid).astype(jnp.uint32)  # word carry propagate
        sh = 1
        while sh < R * LANE:
            g = g | (p & shift_words_up(g, sh, zero))
            p = p & shift_words_up(p, sh, zero)
            sh *= 2
        cin = shift_words_up(g, 1, zero)
        return s0 + cin

    @pl.when(j0 == 0)
    def _init():
        # band's top K+1 bits set: word bits at positions >= B-1-K
        lo = B - 1 - K
        full = nbits >= lo
        part = (nbits + 32 > lo) & ~full
        shift_amt = jnp.clip(lo - nbits, 0, 31).astype(jnp.uint32)
        vp_ref[...] = jnp.where(full, ones,
                                jnp.where(part, ones << shift_amt, zero))
        vn_ref[...] = zero
        dist_ref[...] = jnp.zeros((ROWS, LANE), jnp.int32)

    pstart = la - K

    def step(jj, carry):
        vp, vn, dist = carry
        j = j0 + jj
        pm = pm_ref[jj]
        x = pm
        d0 = (big_and_add(x, vp) ^ vp) | x | vn
        hp = vn | ~(d0 | vp)
        hn = d0 & vp

        # delta: diagonal phase watches the band's top bit; horizontal
        # phase walks a descending bit of hp/hn (band_kernel generalized)
        diag_delta = 1 - ((d0 >> 31) & 1).astype(jnp.int32)
        hbg = jnp.maximum(B - 2 - (j - pstart), 0)     # global bit pos
        hword = hbg // 32
        hbit = (hbg % 32).astype(jnp.uint32)
        hor_delta = (((hp >> hbit) & 1).astype(jnp.int32)
                     - ((hn >> hbit) & 1).astype(jnp.int32))
        in_diag = j < pstart
        sel_word = jnp.where(in_diag, R * LANE - 1, hword)
        delta = jnp.where(in_diag, diag_delta, hor_delta)
        dist = dist + jnp.where((widx == sel_word) & (j < lb), delta, 0)

        d0s = (d0 >> 1) | (next_word(d0, zero) << 31)
        nvp = hn | ~(d0s | hp)
        nvn = d0s & hp
        return nvp, nvn, dist

    trips = jnp.clip(lb - j0, 0, CHUNK)
    vp, vn, dist = lax.fori_loop(
        0, trips, step, (vp_ref[...], vn_ref[...], dist_ref[...]))
    vp_ref[...] = vp
    vn_ref[...] = vn
    dist_ref[...] = dist

    @pl.when(pl.program_id(0) == nchunks - 1)
    def _emit():
        out_ref[0, 0] = scal_ref[2] + jnp.sum(
            jnp.where(valid, dist_ref[...], 0))


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def _run(scal, stream, *, R: int, interpret: bool = False):
    nchunks = stream.shape[0] // CHUNK
    kern = functools.partial(_kernel, R=R, nchunks=nchunks)
    return pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, ROWS, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, LANE), jnp.uint32),
            pltpu.VMEM((ROWS, LANE), jnp.uint32),
            pltpu.VMEM((ROWS, LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(scal, stream)


# ----------------------------------------------------------------- API

def max_cutoff(R: int) -> int:
    return R * 2048 - 1


def lev_pair_banded(a, b, cutoff: int, *, R: int | None = None,
                    interpret: bool = False) -> int:
    """Banded distance of one pair; exact when the result <= cutoff
    (results above the cutoff are only guaranteed to exceed it)."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    if a.size < b.size:
        a, b = b, a                       # pattern = longer string
    la, lb = int(a.size), int(b.size)
    if lb == 0:
        return la
    if R is None:
        R = max(1, -(-(2 * cutoff + 2) // 4096))
    if cutoff > max_cutoff(R):
        raise ValueError(f"cutoff {cutoff} needs R > {R}")
    if cutoff >= la:
        raise ValueError("banded pair kernel requires cutoff < len")
    # local vocab: kernel compares ids >= 0; sentinel -1 never matches
    vocab = np.unique(np.concatenate([a, b]))
    a32 = np.searchsorted(vocab, a).astype(np.int32)
    b32 = np.searchsorted(vocab, b).astype(np.int32)
    B = R * 4096
    K = int(cutoff)
    lb_pad = -(-lb // CHUNK) * CHUNK
    # a_pad[m] == a[m + K + 1 - B] with -1 outside
    left = B - K - 1
    a_pad = np.full(left + la + lb_pad + 32, -1, np.int32)
    a_pad[left:left + la] = a32
    b_pad = np.full(lb_pad, -2, np.int32)
    b_pad[:lb] = b32
    stream = build_band_stream(jnp.asarray(a_pad), jnp.asarray(b_pad),
                               R=R, lb_pad=lb_pad)
    scal = jnp.array([la, lb, K], jnp.int32)
    out = _run(scal, stream, R=R, interpret=interpret)
    return int(np.asarray(out)[0, 0])


def lev_pair(a, b, *, score_cutoff: int | None = None,
             score_hint: int | None = None,
             interpret: bool = False) -> int | None:
    """Uniform Levenshtein of one long pair on TPU, exact.

    Score-hint ladder (``levenshtein.rs:1069-1088``): start from the
    hint's band, double R until the result is certified exact
    (``dist <= max_cutoff(R)``) or proven above ``score_cutoff``.
    """
    a = np.asarray(np.asarray(a), np.int64)
    b = np.asarray(np.asarray(b), np.int64)
    la, lb = (max(a.size, b.size), min(a.size, b.size))
    if lb == 0:
        dist = la
        return dist if score_cutoff is None or dist <= score_cutoff \
            else None
    if score_cutoff is not None and la - lb > score_cutoff:
        return None
    # start from the hint's band (default small, like the reference's
    # max(hint, 31)) and escalate R until certified
    cands = [v for v in (score_hint, score_cutoff) if v is not None]
    hint = min(cands) if cands else 31
    hint = max(min(hint, la - 1), 1)
    R = max(1, -(-(2 * hint + 2) // 4096))
    while True:
        if R > ROWS:
            raise ValueError(
                f"distance exceeds the device band limit "
                f"{max_cutoff(ROWS)}; use the host oracle path")
        K = min(max_cutoff(R), la - 1)
        dist = lev_pair_banded(a, b, K, R=R, interpret=interpret)
        if dist <= K:                      # certified exact
            if score_cutoff is not None and dist > score_cutoff:
                return None
            return dist
        if score_cutoff is not None and K >= score_cutoff:
            return None                    # certified above the cutoff
        if K >= la - 1:
            return dist                    # band spans everything
        R *= 2
