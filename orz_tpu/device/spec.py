"""OTZ format constants and shared pure helpers.

Values shared with the ORZ format (symbol space, ROID schedule, ring size,
match length bounds) are imported from orz_tpu.constants so the two formats
stay aligned where they agree; OTZ-specific values live here.
"""

from __future__ import annotations

import numpy as np

from orz_tpu.constants import (
    LZ_LENID_SIZE,
    LZ_MATCH_MAX_LEN,
    LZ_MATCH_MIN_LEN,
    WORD_TABLE_SIZE,
    build_roid_tables,
)

OTZ_MAGIC = b"OTZ1"

# Logical data starts at this offset inside the padded buffer; the front pad
# is zeros so contexts of the first positions are well-defined without
# branches (the ORZ analogue is the sentinel region, reference src/lib.rs:54).
PAD_FRONT = 16
# Tail slack: LCP reads run up to LZ_MATCH_MAX_LEN past the end, dword loads
# 3 past that, word-model values 2 past.
PAD_TAIL = LZ_MATCH_MAX_LEN + 32

# OTZ inserts EVERY position into the context rings (bytes-only state), so
# entries are ~8x denser than orz's item starts; the reduced-offset space is
# widened to compensate: the reference ROID schedule (bitlen = roid // 2,
# reference src/lz.rs:494-534) is continued from 22 ids / 4094 offsets to
# 28 ids / 32766 offsets, reaching comparable history per context.
RING = 32766  # reachable reduced offsets
OTZ_ROID_GROUP = 2  # ids per extra-bit level (the reference's schedule,
# src/lz.rs:494-534; measured better than finer 3-per-level bands, whose
# larger symbol alphabet costs more in symrank churn than it saves in raw
# offset bits)
NUM_CONTEXTS = 256  # hash1-style byte contexts

# rep-match: a match whose distance equals the previous match's distance is
# coded with a dedicated symbol family and NO offset bits (the decoder
# tracks the last match distance).  The LZMA-family rep0 idea; the
# reference's len_min/len_expected side-info (src/matcher.rs:32-50) exploits
# the same target-reuse redundancy in a parse-coupled way that a
# parallel encoder cannot reproduce.
# extended ROID schedule: reduced_offset -> (roid, robitlen, robits)
_enc, _dec = build_roid_tables(RING, OTZ_ROID_GROUP)
ROID_ENC = np.asarray(_enc, dtype=np.int32)
ROID_DEC = np.asarray(_dec, dtype=np.int32)
OTZ_ROID_SIZE = len(ROID_DEC)  # 28

REP0_BASE = 256 + OTZ_ROID_SIZE * LZ_LENID_SIZE  # 424..429: rep0 lenids
SYMRANK_NUM_SYMBOLS = REP0_BASE + LZ_LENID_SIZE + 1  # 431
WORD_SYMBOL = SYMRANK_NUM_SYMBOLS - 1  # 430

# Match-length-extension table C: eml values 0..239 code lengths at or
# above the len_min floor (the reference's scheme); the NEGATIVE BAND
# 240..255 codes lengths BELOW it: eml = 240 + (len_min - 1 - L), reaching
# 16 under.  Without it, any parse emitting a match shorter than a
# previous match against the same target (a sequential-search invariant
# the parallel parse and truncating DP edges cannot uphold) forced length
# prediction off for the whole segment (~3.5 pt of ratio).
TABC_SIZE = LZ_MATCH_MAX_LEN + 16  # 256
NEG_EML_BASE = LZ_MATCH_MAX_LEN  # 240
NEG_EML_DEPTH = 16
CHUNK_INPUT_DEFAULT = 1 << 21  # input bytes per entropy chunk (own tables)

# ids per extra-bit level in the extended schedule, as a shift: roid =
# (level << ROID_GROUP_BITS) + (off >> level) (see ops/parse.py roid_of_ro)
ROID_GROUP_BITS = 1  # log2(OTZ_ROID_GROUP)

# Parse fence: no item may cross a FENCE-aligned boundary (relative to the
# segment start).  Encoder-side this truncates matches (the analyze cap) and
# blocks fence-straddling word items; it is what makes item extraction a
# parallel per-block walk (ops/parse.py walk_items).  It leaks into the
# format ONLY through the length-prediction floor: len_min is capped by the
# fence room at the consuming position, so decoders apply the same cap
# (refcodec decode / csrc/otz_core.cpp).
# 4096 (was 512): with LZ_MATCH_MAX_LEN = 240 a fence truncates only
# matches starting in its last 240 bytes; measured on the sequential
# oracle, 512 -> 4096 recovers 0.71 pt of ratio vs orz (100.95 -> 100.24%)
# and 4096 -> no fence would recover just 0.09 pt more.
FENCE = 4096

# --- OTZ2: item-start rings (docs/OTZ2_DESIGN.md) --------------------------
# rings_mode segment-header bit: 0 = every position enters its context ring
# (bytes-only OTZ1 rule); 1 = only ITEM STARTS do (the reference's economics,
# src/matcher.rs:62-80: ~6.5 raw offset bits/match instead of ~8; the
# decoder inserts each item's start as it decodes).  The parallel encoder
# resolves the parse<->ring circularity with DEMOTION REPAIR instead of a
# fixed-point iteration: candidates of a re-parse are masked to the previous
# parse's item starts (gated by start-rank-estimate offsets over that mask),
# and at emission any non-rep0 match whose target is not a final item start
# — or whose exact start-rank offset reaches RING — is demoted to literals.
# Demotion only ADDS item starts (the span becomes length-1 literal items;
# later item boundaries never move), so the repair loop is monotone and a
# few passes converge; a segment that still has violations after
# OTZ2_REPAIR_PASSES falls back to rings_mode=0 (always legal, per-segment
# header bit).  rep0 matches are exempt: the decoder resolves them from the
# last match distance without touching the rings.
import os as _os_otz2

OTZ2_SHIFTS = int(_os_otz2.environ.get("OTZ2_SHIFTS", "96"))
# sorted-space shift window for the masked candidate loop (legacy uniform
# knob; OTZ2_SCHEDULE supersedes it when set)
OTZ2_NEAR = int(_os_otz2.environ.get("OTZ2_NEAR", "96"))
# shifts past this accept candidates only for queries that are themselves
# previous item starts (ops/match_pallas.py near_depth): at item-start mask
# density ~0.2 the deep window mostly re-prices existing items, and gating
# it that way is quality-equivalent (measured 100.20% vs 100.18% at 1 MiB,
# 384 shifts); 0 = all queries see the full window
OTZ2_ITERS = int(_os_otz2.environ.get("OTZ2_ITERS", "6"))
# masked re-parses before emission (quality knob; measured
# 256 KiB vs orz -l2: 4 -> 101.01%, 6 -> 100.35%, 8 -> 100.27%, and the
# conform-analyze + vectorized repair emission matches the re-target repair
# to 0.03 pt)


def otz2_schedule(level: int = 2) -> list:
    """Per-iteration shift depths, by level.

    Round-5 remeasurement at the 8 MiB bucket (real corpus, on-chip,
    round-trip gated): leading 96-shift mask-settling iterations HURT at
    scale (the short window prices candidates against a starved mask), so
    the l2 default is one settling iteration + 11 deep ones —
    100.48% of orz -l2 vs 100.63% for the former 96x4+384x8 at identical
    cost.  Level 3 runs the same shape 8 iterations deeper (100.12%
    measured; the fixed point oscillates with a damping envelope — see
    STATUS.md round 5 — so returns past ~20 iterations are small).
    Override with OTZ2_SCHEDULE="96x4,384x6"-style strings, or
    OTZ2_ITERS/OTZ2_SHIFTS for uniform schedules."""
    s = _os_otz2.environ.get("OTZ2_SCHEDULE", "")
    if not s:
        if _os_otz2.environ.get("OTZ2_ITERS") or _os_otz2.environ.get(
                "OTZ2_SHIFTS"):
            return [OTZ2_SHIFTS] * OTZ2_ITERS
        if level >= 3:
            return [96] * 1 + [384] * 19
        return [96] * 1 + [384] * 11
    out = []
    for part in s.split(","):
        v, _, r = part.partition("x")
        out += [int(v)] * (int(r) if r else 1)
    return out
OTZ2_REPAIR_PASSES = 6  # combined offset+word-validation demotion passes
# Encoder-side reduced-offset cap for rings_mode=1 (the reference's ring
# depth, src/lz.rs:24).  Measured (512 KiB synthetic text, depth 45): with
# item-start rings AND this cap the offset economics match orz exactly
# (6.45 raw robits + 4.15 roid-entropy bits per match vs 11.4 uncapped);
# far matches cost more in offset bits than they save in literals.  Not a
# format bound — the stream still carries the extended ROID schedule.
OTZ2_RO_CAP = 4094
# The CONFORM analysis (the one emission re-targets against) searches the
# FULL ring: a match about to be demoted to literals is far cheaper coded
# with an 11-13 raw-bit offset (the extended ROID schedule reaches 32766,
# and min_match_len_for_ro still prices far candidates).  Iteration
# analyses keep OTZ2_RO_CAP so parse pricing matches orz economics.
OTZ2_CONFORM_CAP = int(_os_otz2.environ.get("OTZ2_CONFORM_CAP", str(RING)))
# Shift window of the conform analysis; 0 = the schedule's last depth.
# The conform runs once per segment, so a wider window (more replacement
# candidates for matches whose target stopped being an item start) costs
# ~0.1 ms per 128 shifts per 2 MiB — cheap relative to demotion damage.
OTZ2_CONFORM_SHIFTS = int(_os_otz2.environ.get("OTZ2_CONFORM_SHIFTS", "0"))


def otz2_enabled(level: int) -> bool:
    # Default ON at l2 since round 3 (item-start rings recover ~5 pt of
    # ratio at 8 MiB: every-position rings cost ~1.6 extra offset bits per
    # match, and the gap grows with segment size).  OTZ2=0 forces the
    # legacy bytes-ring (OTZ1) throughput mode.
    import os

    return os.environ.get("OTZ2", "1") == "1" and level >= 2

# price gate: far reduced offsets cost 11-13 raw bits, so a minimum match
# length scales with offset distance (near orz's implicit pricing via its
# sparser rings).  OTZ_FAR_GATE env is a tuning knob for experiments; the
# format is whatever the encoder chose (the decoder doesn't care).
import os as _os

FAR_RO_1 = 4094  # beyond the reference's span
FAR_RO_2 = 16382  # distant half of the extended span
_FAR_GATE = int(_os.environ.get("OTZ_FAR_GATE", "2"))


def min_match_len_for_ro(ro):
    """Minimum acceptable match length given the reduced offset (works for
    numpy scalars and jnp arrays)."""
    return LZ_MATCH_MIN_LEN + _FAR_GATE * (ro >= FAR_RO_1) + _FAR_GATE * (ro >= FAR_RO_2)

# Max candidate depth per level: with exact-key grouping every candidate
# shares the hashed dword, so depths are smaller than orz's chain-walk depths
# (reference src/main.rs:97-101 walks 5/15/45 hash-chain nodes, most of which
# fail the first dword test).
LEVEL_CANDIDATES = {0: 4, 1: 8, 2: 32, 3: 32}  # l3: deeper
# iteration schedule (otz2_schedule), same candidate window as l2

# lazy-parse thresholds mirrored from the reference parse heuristics
# (reference src/lz.rs:113-118): matches shorter than MAX_LEN/2 may be
# deferred if the next/next-next position has a strictly better match.
LAZY_LEN_CAP = LZ_MATCH_MAX_LEN // 2  # 120
ROBITS_CHEAP = 8  # robitlen < 8 counts as a "cheap" offset in lazy_len1

assert len(ROID_ENC) == RING and ROID_DEC[-1][1] <= 13

_ALNUM = np.zeros(256, dtype=np.int32)
for _b in range(256):
    _ALNUM[_b] = int(chr(_b).isascii() and chr(_b).isalnum())


def candidate_depth(level: int) -> int:
    return LEVEL_CANDIDATES[level]


def n_chunks_for(raw_len: int, chunk_input: int) -> int:
    return max(1, -(-raw_len // chunk_input))


# --- pure per-position model functions (numpy, vectorized over positions) ---


def cctx_all(buf: np.ndarray) -> np.ndarray:
    """Byte context in which each position is coded: low 7 bits of the
    previous byte plus an is-alphanumeric bit of the byte before that
    (the ORZ hash1 of pos-1, reference src/lz.rs:481-486)."""
    b = buf.astype(np.int32)
    prev1 = np.roll(b, 1)
    prev2 = np.roll(b, 2)
    prev1[0] = 0
    prev2[:2] = 0
    return (prev1 & 0x7F) | (_ALNUM[prev2] << 7)


def h2_all(buf: np.ndarray) -> np.ndarray:
    """Word-model key AT each position x, over bytes x-2..x (the ORZ hash2
    shape, reference src/lz.rs:488-492): 15 bits."""
    b = buf.astype(np.int32)
    prev1 = np.roll(b, 1)
    prev2 = np.roll(b, 2)
    prev1[0] = 0
    prev2[:2] = 0
    c_prev = (prev1 & 0x7F) | (_ALNUM[prev2] << 7)
    return (b & 0x7F) | (c_prev << 7)


def dword_all(buf: np.ndarray) -> np.ndarray:
    """Little-endian u32 at each position (reads 3 bytes past the end, which
    the tail pad covers)."""
    b = buf.astype(np.uint32)
    return b | np.roll(b, -1) << 8 | np.roll(b, -2) << 16 | np.roll(b, -3) << 24


def match_key_all(buf: np.ndarray) -> np.ndarray:
    """Candidate grouping key: context in the high 8 bits, 23-bit
    multiplicative hash of the dword below (31 bits total so the key is a
    non-negative int32 for device sorts).  Collisions are part of the
    format's *encoder* behavior (they occupy candidate slots) but never its
    correctness: every candidate is length-verified."""
    h23 = ((dword_all(buf) * np.uint32(2654435761)) >> np.uint32(8)).astype(np.int64) & 0x7FFFFF
    return (cctx_all(buf).astype(np.int64) << 23) | h23
