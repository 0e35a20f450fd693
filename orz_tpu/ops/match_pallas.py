"""Pallas TPU kernel for the candidate depth loop of the match finder.

ops/analyze.py sorts every position into (mkey, pos) order, where the j-th
previous same-key candidate of a position sits exactly j slots earlier; the
depth loop is then pure shift-compare-select arithmetic.  The XLA fori_loop
version streamed every operand array through HBM once per round (~50 ms at
4 MiB x depth 32 on v5e).  This kernel runs all `depth` rounds over a VMEM
tile, so each operand is read from HBM exactly once:

- A linear shift by j over the row-major (R, 128) tile is a lane rotation
  by j plus, for the first j lanes of each row, the same rotation of the
  row-above view (`xdown`).  `xdown` is built once per array per tile; each
  round then costs two static rotations and a select.
- The round loop is unrolled (depth is static and < 128), so every rotation
  amount is a compile-time constant.
- The tile halo is one extra row: the last row of the previous tile, padded
  with the same fills the XLA loop used (key -1 = "no candidate", matching
  the oracle's empty chains at the segment front).

Oracle: the depth loop inside orz_tpu/device/refcodec.py analyze_ref
(reference src/matcher.rs:135-192 is the sequential ancestor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orz_tpu.device.spec import FENCE, PAD_FRONT, RING, min_match_len_for_ro

N_DW = 16  # dwords of LCP window carried through the sort (64 bytes, must
# equal ops/analyze.py LCP0/4: candidates are scored by LCP within this
# window; the wider window both cuts the extension terminal set and
# recovers ~0.17 pt of ratio vs orz -l2)
ROWS = 256  # tile rows; tile = (ROWS, 128) int32 per operand (128 KiB).
# At N_DW=16 the masked kernel's ~20 operand tiles + shift views need
# ~17 MB of scoped VMEM — above the 16 MB default ceiling (a compiler
# budget, not physical VMEM), so every jit entry containing this kernel
# goes through utils.tpu_jit, which raises the ceiling on TPU backends
LANES = 128


def _lcp_w(xors):
    """LCP in bytes over the len(xors)*4-byte window from dword XORs (LE)."""

    def partial_bytes(v):
        b0 = (v & 0xFF) == 0
        b1 = (v & 0xFFFF) == 0
        b2 = (v & 0xFFFFFF) == 0
        return b0.astype(jnp.int32) + (b0 & b1) + (b0 & b1 & b2)

    lcp = jnp.full(xors[0].shape, 4 * len(xors), jnp.int32)
    for t in range(len(xors) - 1, -1, -1):
        lcp = jnp.where(xors[t] != 0, 4 * t + partial_bytes(xors[t]), lcp)
    return lcp


def _make_kernel(depth: int, n_arrays: int, masked: bool = False,
                 ro_cap: int = RING, near_depth: int = 0,
                 ro_cap_near: int | None = None):
    """masked=True: the OTZ2 candidate loop (spec.py) — only rows whose
    mask payload is 1 may be candidates (they are the previous parse's item
    starts), rank_s is the MASKED in-context prefix count (so ro is a
    start-rank estimate), and offsets are gated at ro_cap (the encoder's
    search cap, OTZ2_RO_CAP) instead of RING.

    near_depth > 0 (masked only): rounds past near_depth accept candidates
    only for queries that are themselves mask rows (previous item starts) —
    the parse re-decides deep matches only where an item already starts.
    Quality-equivalent to a two-pass design whose deep pass runs on
    compacted mask rows at ~mask-density cost."""

    def kernel(*refs):
        # refs: n_arrays block inputs, n_arrays halo rows, end scalar,
        #       3 outputs (bq, bro, blen)
        ins = refs[:n_arrays]
        halos = refs[n_arrays : 2 * n_arrays]
        end_ref = refs[2 * n_arrays]
        bq_ref, bro_ref, blen_ref = refs[2 * n_arrays + 1 :]
        end = end_ref[0, 0]

        blk = pl.program_id(0)
        # msk, msp, rank, dwords [, mask]
        fills = (-1, 0, 0) + (0,) * N_DW + ((0,) if masked else ())

        cur = [r[:] for r in ins]
        msk, msp, rank_s = cur[0], cur[1], cur[2]
        dw_s = cur[3 : 3 + N_DW]
        mask_s = cur[3 + N_DW] if masked else None

        # k-rows-down views, seeded with the previous tile's last rows (the
        # XLA-loop fill values on the very first tile).  A flat shift by
        # j = 128*a + b mixes rows r-a and r-a-1 (both lane-rotated by b),
        # so reach depth d needs down-views for k = 0..ceil(d/128); the
        # 8-row halo block supports shifts up to 8*128-1 = 1023.
        n_down = -(-depth // LANES) + 1
        assert n_down <= 9
        down = []  # down[a][k] = ins[a] shifted k rows down
        for a, (h, f) in enumerate(zip(halos, fills)):
            r = cur[a]
            views = [r]
            for k in range(1, n_down):
                top = jnp.where(
                    blk == 0,
                    jnp.full((k, LANES), f, jnp.int32),
                    h[8 - k : 8, :],  # halo = previous tile's last 8 rows
                )
                views.append(
                    jnp.concatenate([top, r[0 : ROWS - k, :]], axis=0)
                )
            down.append(views)

        lane = lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        cap = jnp.minimum(
            FENCE - ((msp - PAD_FRONT) & (FENCE - 1)), end - msp
        )

        best_s = jnp.zeros((ROWS, LANES), jnp.int32)
        best_q = jnp.full((ROWS, LANES), -1, jnp.int32)
        best_ro = jnp.zeros((ROWS, LANES), jnp.int32)
        best_len = jnp.zeros((ROWS, LANES), jnp.int32)

        def make_round(rows_a):
            """Round body for shifts j = 128*rows_a + b (rows_a static):
            the sources are down-views rows_a and rows_a+1, both
            lane-rotated by b."""
            hi = down_views(rows_a)
            lo = down_views(min(rows_a + 1, n_down - 1))

            def round_b(b, carry):
                j = rows_a * LANES + b
                best_s, best_q, best_ro, best_len = carry
                sh = []
                for a in range(n_arrays):
                    r_hi = pltpu.roll(hi[a], b, 1)
                    r_lo = pltpu.roll(lo[a], b, 1)
                    sh.append(jnp.where(lane < b, r_lo, r_hi))
                mskj, mspj, rankj = sh[0], sh[1], sh[2]
                same = mskj == msk
                if masked:
                    # rank_s counts masked predecessors only; for a masked
                    # candidate q, rankj IS its start-rank (exclusive), so
                    # ro = scnt_now(p) - scnt_now(q) - 1 (oracle analyze_ref)
                    ro = rank_s - 1 - rankj
                    ok = same & (sh[3 + N_DW] == 1) & (ro < ro_cap)
                    if near_depth:
                        deep_ok = (mask_s == 1) | (j <= near_depth)
                        ok = ok & deep_ok
                else:
                    ro = rank_s - 1 - rankj
                    ok = same & (ro < RING)
                lcp = _lcp_w([sh[3 + t] ^ dw_s[t] for t in range(N_DW)])
                lcp = jnp.minimum(lcp, cap)
                ok = ok & (lcp >= min_match_len_for_ro(ro))
                # recency bonus must stay BELOW one lcp step (1024 > any
                # depth; 64 overflowed a bucket at masked depth 96)
                score = jnp.where(ok, lcp * 1024 + (1023 - j), -1)
                if masked and ro_cap_near is not None and ro_cap_near < ro_cap:
                    # two-tier cap (conform rescue): candidates past the
                    # near cap score BELOW every near candidate (far
                    # offsets cost 11-13 raw bits; they only beat demoting
                    # the match to literals), ranked among themselves by
                    # lcp alone
                    score = jnp.where(ok & (ro >= ro_cap_near), lcp, score)
                better = score > best_s  # strict: ties keep more recent j
                return (
                    jnp.maximum(best_s, score),
                    jnp.where(better, mspj, best_q),
                    jnp.where(better, ro, best_ro),
                    jnp.where(better, lcp, best_len),
                )

            return round_b

        def down_views(k):
            return [down[a][k] for a in range(n_arrays)]

        carry = (best_s, best_q, best_ro, best_len)
        if depth <= 32:
            # static unroll: constant roll amounts compile to the leanest
            # code and this is the hot OTZ1 path
            rb = make_round(0)
            for j in range(1, depth + 1):
                carry = rb(j, carry)
        else:
            # dynamic-shift rounds: a static unroll of the 96-shift masked
            # window took >25 min of Mosaic compile at the 8 MiB bucket; a
            # fori_loop with dynamic rotates compiles in seconds.  One
            # fori per 128-shift band (the down-view pair is static per
            # band).  Bands run through depth // LANES inclusive: when
            # depth is an exact multiple of 128 the final shift j == depth
            # lives alone in the last band at b == 0 (a range(n_down - 1)
            # loop silently dropped it — "384-shift" windows ran 383 and
            # missed candidates exactly at chain index 384).
            for a_rows in range(depth // LANES + 1):
                b_lo = 1 if a_rows == 0 else 0
                b_hi = min(LANES, depth + 1 - a_rows * LANES)
                if b_lo >= b_hi:
                    continue
                carry = lax.fori_loop(b_lo, b_hi, make_round(a_rows), carry)
        _, best_q, best_ro, best_len = carry

        bq_ref[:] = best_q
        bro_ref[:] = best_ro
        blen_ref[:] = best_len

    return kernel


@partial(jax.jit,
         static_argnames=("depth", "ro_cap", "near_depth", "ro_cap_near"))
def match_depth_pallas(msk, msp, rank_s, dw_s, end, depth: int,
                       mask_s=None, ro_cap: int = RING,
                       near_depth: int = 0, ro_cap_near: int | None = None):
    """(best_q_s, best_ro_s, best_len_s) over the sorted arrays.

    All inputs are n-length int32 in (mkey, pos)-sorted order; dw_s is a
    tuple of N_DW dword arrays (byte windows riding the sort as payload).
    Semantics match the XLA fori_loop they replace bit-for-bit.

    mask_s (OTZ2): 0/1 start mask riding the sort; only mask==1 rows are
    candidates, rank_s must hold MASKED prefix counts, and offsets gate at
    ro_cap (spec.OTZ2_RO_CAP).  `depth` then counts sorted-space SHIFTS
    (the masked window), not accepted candidates — at item-start mask
    density ~0.2, effective candidate depth is ~depth/5, so quality-mode
    windows run 256-512 shifts (the 8-row halo reaches 1023).
    """
    assert 0 < depth < 1024  # 8-row halo reach; score packs lcp*1024+recency
    n = msk.shape[0]
    blk_elems = ROWS * LANES
    n_blocks = -(-n // blk_elems)
    n_pad = n_blocks * blk_elems

    arrays = [msk, msp, rank_s] + [d.astype(jnp.int32) for d in dw_s]
    if mask_s is not None:
        arrays.append(mask_s.astype(jnp.int32))
    n_arrays = len(arrays)
    padded = []
    for a, x in enumerate(arrays):
        # tail pad never matches: key pad keeps the sentinel, rest zeros
        fill = jnp.int32(0x7FFFFFFF) if a == 0 else jnp.int32(0)
        padded.append(
            jnp.concatenate([x, jnp.full(n_pad - n, fill, jnp.int32)])
            .reshape(n_blocks * ROWS, LANES)
        )

    blk_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(
        (8, LANES), lambda i: (jnp.maximum(i * (ROWS // 8) - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _make_kernel(depth, n_arrays, masked=mask_s is not None,
                     ro_cap=ro_cap, near_depth=near_depth,
                     ro_cap_near=ro_cap_near),
        interpret=jax.default_backend() != "tpu",
        grid=(n_blocks,),
        in_specs=[blk_spec] * n_arrays + [halo_spec] * n_arrays
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * ROWS, LANES), jnp.int32)
        ] * 3,
    )(*padded, *padded, jnp.reshape(end, (1, 1)).astype(jnp.int32))
    return tuple(o.reshape(-1)[:n] for o in out)
