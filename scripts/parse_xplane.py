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


if __name__ == "__main__":
    top_ops(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
