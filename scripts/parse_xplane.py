"""Parse a jax.profiler xplane.pb (raw proto walk) and print top TPU ops."""
import collections
import sys


def fields(buf):
    pos = 0
    n = len(buf)
    while pos < n:
        tag = 0; shift = 0
        while True:
            b = buf[pos]; pos += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        f, w = tag >> 3, tag & 7
        if w == 0:
            v = 0; shift = 0
            while True:
                b = buf[pos]; pos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield f, w, v
        elif w == 2:
            ln = 0; shift = 0
            while True:
                b = buf[pos]; pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield f, w, buf[pos:pos + ln]; pos += ln
        elif w == 5:
            yield f, w, buf[pos:pos + 4]; pos += 4
        elif w == 1:
            yield f, w, buf[pos:pos + 8]; pos += 8


def dec(v):
    try:
        return v.decode()
    except Exception:
        return None


def top_ops(path, top=25):
    data = open(path, "rb").read()
    for f, w, plane in fields(data):
        if f != 1:
            continue
        pname = None
        for f2, w2, v in fields(plane):
            if f2 == 2 and w2 == 2:
                pname = dec(v)
                break
        if pname != "/device:TPU:0":
            continue
        metas = {}
        lines = []
        for f2, w2, v in fields(plane):
            if f2 == 4:
                k = None; nm = None
                for f3, w3, v3 in fields(v):
                    if f3 == 1 and w3 == 0:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in fields(v3):
                            if f4 == 2 and w4 == 2:
                                nm = dec(v4)
                metas[k] = nm
            elif f2 == 3:
                lines.append(v)
        totals = collections.Counter()
        for line in lines:
            lname = None
            for f2, w2, v in fields(line):
                if f2 == 2 and w2 == 2:
                    lname = dec(v)
            if lname != "XLA Ops":
                continue
            for f2, w2, v in fields(line):
                if f2 == 4 and w2 == 2:
                    mid = None; dur = 0
                    for f3, w3, v3 in fields(v):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    totals[metas.get(mid) or str(mid)] += dur
        for opname, ps in totals.most_common(top):
            print(f"{ps/1e9:9.2f} ms  {str(opname)[:115]}")


def _events(path):
    """Yield (offset_ps, duration_ps, op_name) for every XLA-Ops event on the
    TPU plane.  XEvent fields: 1=metadata_id, 2=offset_ps, 3=duration_ps."""
    data = open(path, "rb").read()
    for f, w, plane in fields(data):
        if f != 1:
            continue
        pname = None
        for f2, w2, v in fields(plane):
            if f2 == 2 and w2 == 2:
                pname = dec(v)
                break
        if pname != "/device:TPU:0":
            continue
        metas = {}
        lines = []
        for f2, w2, v in fields(plane):
            if f2 == 4:
                k = None; nm = None
                for f3, w3, v3 in fields(v):
                    if f3 == 1 and w3 == 0:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in fields(v3):
                            if f4 == 2 and w4 == 2:
                                nm = dec(v4)
                metas[k] = nm
            elif f2 == 3:
                lines.append(v)
        for line in lines:
            lname = None
            for f2, w2, v in fields(line):
                if f2 == 2 and w2 == 2:
                    lname = dec(v)
            if lname != "XLA Ops":
                continue
            for f2, w2, v in fields(line):
                if f2 == 4 and w2 == 2:
                    mid = None; off = 0; dur = 0
                    for f3, w3, v3 in fields(v):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 0:
                            off = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    yield off, dur, metas.get(mid) or str(mid)


def _category(name: str) -> str:
    """Bucket an HLO op name into a coarse stage category."""
    head = name.lstrip("%").split(" ")[0].split(".")[0]
    table = {
        "convolution_add_fusion": "matmul (MXU)",
        "convolution_fusion": "matmul (MXU)",
        "convolution": "matmul (MXU)",
        "dot": "matmul (MXU)",
        "custom-call": "matmul (MXU)",  # TPU library matmul
        "sort": "sort",
        "bitcast_dynamic-update-slice_fusion": "activation save/stack (DUS)",
        "dynamic-update-slice_fusion": "activation save/stack (DUS)",
        "select_add_fusion": "grad accumulate",
        "all-reduce": "collective",
        "all-gather": "collective",
        "reduce-scatter": "collective",
        "copy": "copy/layout",
        "copy-start": "copy/layout",
        "copy-done": "copy/layout",
        "bitcast_convert_fusion": "copy/layout",
        "transpose": "copy/layout",
    }
    if head in table:
        return table[head]
    if "gather" in head or "scatter" in head:
        return "gather/scatter"
    if "sort" in head:
        return "sort"
    if head.startswith("while") or head.startswith("conditional") or head.startswith("call"):
        return "control (self)"
    return "elementwise/other fusion"


def self_time_report(path, top=20):
    """Per-op SELF time (parents minus nested children) + category budget.

    Container ops (while/conditional bodies) nest their children's events, so
    summed durations double count; a stack sweep over (offset, duration)
    computes exclusive time, which adds up to the real device busy time."""
    evs = sorted(_events(path), key=lambda e: (e[0], -e[1]))
    if not evs:
        print("no TPU XLA-Ops events found")
        return
    import collections as C

    self_ps = C.Counter()
    n_exec = C.Counter()
    total_wall = 0
    stack = []
    for off, dur, name in evs:
        while stack and off >= stack[-1][1]:
            s_off, s_end, s_name, s_child = stack.pop()
            self_ps[s_name] += (s_end - s_off) - s_child
            n_exec[s_name] += 1
        if stack:
            stack[-1][3] += dur
        else:
            total_wall += dur
        stack.append([off, off + dur, name, 0])
    while stack:
        s_off, s_end, s_name, s_child = stack.pop()
        self_ps[s_name] += (s_end - s_off) - s_child
        n_exec[s_name] += 1

    cats = C.Counter()
    for name, ps in self_ps.items():
        cats[_category(name)] += ps

    total = sum(self_ps.values())
    print(f"device busy: {total/1e9:.2f} ms (top-level wall {total_wall/1e9:.2f} ms)")
    print("\n-- category budget (self time) --")
    for cat, ps in cats.most_common():
        print(f"{ps/1e9:9.2f} ms  {100*ps/total:5.1f}%  {cat}")
    print(f"\n-- top {top} ops (self time / n execs / per-exec) --")
    for name, ps in self_ps.most_common(top):
        n = n_exec[name]
        print(f"{ps/1e9:9.2f} ms /{n:5d} /{ps/n/1e9:7.3f} ms  {str(name)[:100]}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "self":
        self_time_report(sys.argv[1], int(sys.argv[3]) if len(sys.argv) > 3 else 20)
    else:
        top_ops(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
