"""Ratio-vs-corpus-size curve: OTZ device pipeline (CPU) against native ORZ.

Separates the scale-dependent part of the ratio gap (history reach, offset
growth) from the flat part (parse quality, entropy modeling): if the gap
grows with size, the lever is reach/economics; if flat, it's the parse.

    python tools/scale_ratio.py [sizes_kb,...] [level]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
from bench import make_corpus
from orz_tpu.cfg import cfg_from_level
from orz_tpu.container import encode_bytes
from orz_tpu.native import NativeBackend
from orz_tpu.device.container import tpu_encode_bytes


def main():
    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["256", "1024", "4096"])]
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    backend = NativeBackend()
    for kb in sizes:
        data = make_corpus(kb * 1024)
        orz = len(encode_bytes(data, cfg_from_level(level), backend))
        otz = len(tpu_encode_bytes(data, level=level, segment_size=8 << 20))
        print(f"{kb:>6} KiB: orz={orz} ({orz/len(data)*100:.2f}%)  "
              f"otz={otz} ({otz/len(data)*100:.2f}%)  "
              f"otz/orz={otz/orz*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
