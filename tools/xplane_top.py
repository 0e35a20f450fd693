"""Minimal XSpace/XPlane trace parser: top device ops by total duration.

The installed tensorboard profiler plugin is version-broken, so this reads
the raw protobuf wire format directly (no proto deps).

    python tools/xplane_top.py <trace.xplane.pb> [top_n]

Schema subset (tensorflow/tsl profiler xplane.proto):
    XSpace.planes = 1
    XPlane: id=1 name=2 lines=3 event_metadata=4(map) stat_metadata=5(map)
    map entry: key=1 value=2
    XEventMetadata: id=1 name=2 display_name=3
    XLine: id=1 name=2 ... events=4 (tags vary slightly across versions;
           events may be 4 or 6 — both are tried)
    XEvent: metadata_id=1 offset_ps=2 duration_ps=3
"""

import sys


def read_varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (tag, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        tag, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            return
        yield tag, wt, v


def parse(path, top_n=25):
    space = open(path, "rb").read()
    totals = {}  # (plane, metadata_id) -> ps
    names = {}  # (plane, metadata_id) -> name

    for tag, wt, plane in fields(space):
        if tag != 1 or wt != 2:
            continue
        plane_name = ""
        for t2, w2, v2 in fields(plane):
            if t2 == 2 and w2 == 2:
                plane_name = v2.decode(errors="replace")
        for t2, w2, v2 in fields(plane):
            if t2 == 4 and w2 == 2:  # event_metadata map entry
                mid, mname = None, ""
                for t3, w3, v3 in fields(v2):
                    if t3 == 1 and w3 == 0:
                        mid = v3
                    elif t3 == 2 and w3 == 2:  # XEventMetadata
                        for t4, w4, v4 in fields(v3):
                            if t4 == 1 and w4 == 0 and mid is None:
                                mid = v4
                            elif t4 == 2 and w4 == 2:
                                mname = v4.decode(errors="replace")
                if mid is not None:
                    names[(plane_name, mid)] = mname
            elif t2 == 3 and w2 == 2:  # XLine
                for t3, w3, v3 in fields(v2):
                    if t3 in (4, 6) and w3 == 2:  # XEvent
                        mid, dur = None, 0
                        for t4, w4, v4 in fields(v3):
                            if t4 == 1 and w4 == 0:
                                mid = v4
                            elif t4 == 3 and w4 == 0:
                                dur = v4
                        if mid is not None:
                            key = (plane_name, mid)
                            totals[key] = totals.get(key, 0) + dur

    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    out = []
    for (plane, mid), ps in rows:
        name = names.get((plane, mid), f"id{mid}")
        out.append((ps / 1e12, plane, name))
    return out


if __name__ == "__main__":
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rows = parse(sys.argv[1], top_n)
    shown = 0
    for sec, plane, name in rows:
        if "TPU" not in plane and "/device" not in plane.lower():
            continue
        print(f"{sec:9.4f}s  {name[:100]}")
        shown += 1
        if shown >= top_n:
            break
    if shown == 0:  # fall back: all planes
        for sec, plane, name in rows[:top_n]:
            print(f"{sec:9.4f}s  [{plane[:30]}] {name[:80]}")
