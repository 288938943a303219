"""Parse a jax.profiler xplane trace into a per-op device-time report.

Usage: python tools/trace_report.py <trace_dir> [top_n] [--merge]

<trace_dir> is the dir passed to jax.profiler.trace(...). Uses a minimal
hand-rolled protobuf wire-format reader for the XSpace/XPlane messages
(the installed tensorboard_plugin_profile's generated protos are
incompatible with the environment's protobuf runtime).

--merge groups ops by a normalized name (strips trailing .N dedup
suffixes) so repeated instances of the same fusion aggregate.
"""
import re
import sys
from collections import defaultdict
from pathlib import Path


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    lines = []
    ev_meta = {}
    for fnum, wt, val in fields(buf):
        if fnum == 2:
            name = val.decode()
        elif fnum == 3:
            lines.append(val)
        elif fnum == 4:  # map<int64, XEventMetadata>
            k = v = None
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 2:
                            v = v3.decode()
            if k is not None and v is not None:
                ev_meta[k] = v
    return name, lines, ev_meta


def parse_line(buf):
    name = ""
    events = []
    for fnum, wt, val in fields(buf):
        if fnum == 2:
            name = val.decode()
        elif fnum == 11:
            name = val.decode() or name
        elif fnum == 4:
            mid = off = dur = 0
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    off = v2
                elif f2 == 3:
                    dur = v2
            events.append((mid, off, dur))
    return name, events


# async-start spans cover their whole issue->completion window, which
# OVERLAPS the compute running underneath — summing them double-counts
# massively (a bs=8 forward trace read 7.2 s of "device time" for 0.76 s
# of wall). The per-op table drops them; the *-done ops (the actual stall,
# if any) and the compute ops remain.
_ASYNC_START = re.compile(r"(slice-start|copy-start|async-start|"
                          r"all-reduce-start|collective-permute-start|"
                          r"send|recv)")


def _union_ms(spans):
    """Total covered time of possibly-overlapping (start, end) spans."""
    if not spans:
        return 0.0
    spans.sort()
    total = 0
    cs, ce = spans[0]
    for s, e in spans[1:]:
        if s > ce:
            total += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    total += ce - cs
    return total / 1e9


def report(trace_dir, top_n=40, merge=False):
    pbs = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not pbs:
        sys.exit(f"no xplane.pb under {trace_dir}")
    buf = pbs[-1].read_bytes()
    out = []
    for fnum, wt, val in fields(buf):
        if fnum != 1:
            continue
        pname, lines, ev_meta = parse_plane(val)
        if "TPU" not in pname and "tpu" not in pname:
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        spans = []
        async_spans = []
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if "XLA Ops" not in lname:
                continue
            for mid, off, dur in events:
                name = ev_meta.get(mid, f"?{mid}")
                if _ASYNC_START.search(name):
                    async_spans.append((off, off + dur))
                    continue
                spans.append((off, off + dur))
                if merge:
                    name = re.sub(r"\.\d+$", "", name)
                totals[name] += dur / 1e9  # ps -> ms
                counts[name] += 1
        if totals:
            out.append((pname, totals, counts, spans, async_spans))
    for pname, totals, counts, spans, async_spans in out:
        wall = (max(e for _, e in spans + async_spans)
                - min(s for s, _ in spans + async_spans)) / 1e9
        busy = _union_ms(spans)
        print(f"== plane: {pname}")
        print(f"   wall {wall:.2f} ms | sync-op busy {busy:.2f} ms "
              f"({100 * busy / wall:.1f}%) | sync-op sum "
              f"{sum(totals.values()):.2f} ms | async-start spans excluded: "
              f"{len(async_spans)} covering {_union_ms(async_spans):.2f} ms")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{ms:9.3f} ms  x{counts[name]:<4d} {name[:120]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--merge"]
    report(args[0], int(args[1]) if len(args) > 1 else 40,
           merge="--merge" in sys.argv)
