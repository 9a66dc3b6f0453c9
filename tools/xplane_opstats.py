#!/usr/bin/env python
"""Standalone xplane.pb -> per-HLO self-time table (no tensorboard/tf needed:
the vendored converters in this image are protobuf-version-broken, so this
walks the XSpace proto generically).

Usage: python tools/xplane_opstats.py /tmp/jaxtrace [n_iters]
Prints ops sorted by total self time; divide by n_iters for per-iter ms.
"""
import collections
import glob
import struct
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    i = 0
    while i < len(buf):
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse(pb_path):
    """Returns {plane_name: [(event_name, total_duration_ps, count)]}."""
    data = open(pb_path, "rb").read()
    out = {}
    for fn, _, plane in _fields(data):
        if fn != 1:
            continue
        name = ""
        lines = []
        emeta = {}
        for f2, _, v in _fields(plane):
            if f2 == 2:
                name = v.decode()
            elif f2 == 3:
                lines.append(v)
            elif f2 == 4:
                # map<int64, XEventMetadata{id=1, name=2}>
                k = None
                mid, mname = None, ""
                for f3, _, v3 in _fields(v):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        for f4, _, v4 in _fields(v3):
                            if f4 == 1:
                                mid = v4
                            elif f4 == 2:
                                mname = v4.decode()
                emeta[k if mid is None else mid] = mname
        agg = collections.Counter()
        cnt = collections.Counter()
        for line in lines:
            for f3, _, v3 in _fields(line):
                if f3 != 4:      # XLine.events
                    continue
                mid = None
                dur = 0
                for f4, wt4, v4 in _fields(v3):
                    if f4 == 1:  # metadata_id
                        mid = v4
                    elif f4 == 3:  # duration_ps
                        dur = v4
                nm = emeta.get(mid, str(mid))
                agg[nm] += dur
                cnt[nm] += 1
        out[name] = [(n, agg[n], cnt[n]) for n in agg]
    return out


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    pbs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        print("no xplane.pb under", logdir)
        return
    planes = parse(pbs[0])
    for pname, evs in planes.items():
        if not evs or "/device" not in pname.lower() and "TPU" not in pname:
            continue
        evs.sort(key=lambda e: -e[1])
        tot = sum(e[1] for e in evs) / 1e9 / iters
        print(f"== {pname}: {tot:.2f} ms/iter total self time ==")
        for n, dur, c in evs[:top]:
            print(f"{dur / 1e9 / iters:9.3f} ms  x{c:<5d} {n[:100]}")


if __name__ == "__main__":
    main()
