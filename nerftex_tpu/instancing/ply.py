"""Minimal PLY mesh IO (ascii + binary_little_endian).

Replaces the reference's igl::readPLY (instancer.cpp:236, 279): reads vertex
positions, optional normals (nx,ny,nz), optional UVs (s,t or u,v or
texture_u/texture_v), and triangle faces.  Quads are fan-triangulated.
"""

import numpy as np

_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}

_UV_NAMES = (("s", "t"), ("u", "v"), ("texture_u", "texture_v"))


class PlyData:
    def __init__(self, V, F=None, N=None, UV=None):
        self.V = np.asarray(V, np.float32).reshape(-1, 3)
        self.F = np.asarray(F, np.int32).reshape(-1, 3) if F is not None and len(F) else np.zeros((0, 3), np.int32)
        self.N = np.asarray(N, np.float32).reshape(-1, 3) if N is not None else None
        self.UV = np.asarray(UV, np.float32).reshape(-1, 2) if UV is not None else None


def read_ply(path: str) -> PlyData:
    with open(path, "rb") as f:
        data = f.read()

    header_end = data.find(b"end_header\n")
    if header_end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header = data[:header_end].decode("ascii", "replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    if not header or header[0].strip() != "ply":
        raise ValueError(f"{path}: missing ply magic")

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype)|('list', count_t, item_t, name)])
    for line in header[1:]:
        parts = line.strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append([parts[1], int(parts[2]), []])
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", _TYPES[parts[2]], _TYPES[parts[3]], parts[4]))
            else:
                elements[-1][2].append((parts[2], _TYPES[parts[1]]))

    if fmt not in ("ascii", "binary_little_endian"):
        raise ValueError(f"{path}: unsupported format {fmt}")

    parsed = {}
    if fmt == "ascii":
        tokens = body.decode("ascii").split()
        pos = 0
        for name, count, props in elements:
            scalars = {p[0]: [] for p in props if p[0] != "list"}
            lists = {p[3]: [] for p in props if p[0] == "list"}
            for _ in range(count):
                for p in props:
                    if p[0] == "list":
                        n = int(tokens[pos]); pos += 1
                        lists[p[3]].append([float(tokens[pos + k]) for k in range(n)])
                        pos += n
                    else:
                        scalars[p[0]].append(float(tokens[pos])); pos += 1
            parsed[name] = (scalars, lists)
    else:
        offset = 0
        for name, count, props in elements:
            has_list = any(p[0] == "list" for p in props)
            if not has_list:
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                arr = np.frombuffer(body, dt, count, offset)
                offset += dt.itemsize * count
                parsed[name] = ({p[0]: arr[p[0]] for p in props}, {})
            else:
                scalars = {p[0]: [] for p in props if p[0] != "list"}
                lists = {p[3]: [] for p in props if p[0] == "list"}
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            cnt_dt = np.dtype("<" + p[1])
                            n = int(np.frombuffer(body, cnt_dt, 1, offset)[0])
                            offset += cnt_dt.itemsize
                            item_dt = np.dtype("<" + p[2])
                            vals = np.frombuffer(body, item_dt, n, offset)
                            offset += item_dt.itemsize * n
                            lists[p[3]].append(vals.tolist())
                        else:
                            dt = np.dtype("<" + p[1])
                            scalars[p[0]].append(float(np.frombuffer(body, dt, 1, offset)[0]))
                            offset += dt.itemsize
                parsed[name] = (scalars, lists)

    vscalars, _ = parsed.get("vertex", ({}, {}))
    V = np.stack([np.asarray(vscalars[c], np.float32) for c in "xyz"], -1)
    N = None
    if all(c in vscalars for c in ("nx", "ny", "nz")):
        N = np.stack([np.asarray(vscalars[c], np.float32) for c in ("nx", "ny", "nz")], -1)
    UV = None
    for u_name, v_name in _UV_NAMES:
        if u_name in vscalars and v_name in vscalars:
            UV = np.stack(
                [np.asarray(vscalars[u_name], np.float32), np.asarray(vscalars[v_name], np.float32)], -1
            )
            break

    F = []
    if "face" in parsed:
        _, flists = parsed["face"]
        for key in ("vertex_indices", "vertex_index"):
            if key in flists:
                for poly in flists[key]:
                    for k in range(1, len(poly) - 1):  # fan triangulation
                        F.append([poly[0], poly[k], poly[k + 1]])
                break

    return PlyData(V, np.asarray(F, np.int32) if F else None, N, UV)


def write_ply(path: str, V, F=None, N=None, UV=None, binary: bool = True) -> None:
    V = np.asarray(V, np.float32).reshape(-1, 3)
    props = [("x", V[:, 0]), ("y", V[:, 1]), ("z", V[:, 2])]
    if N is not None:
        N = np.asarray(N, np.float32).reshape(-1, 3)
        props += [("nx", N[:, 0]), ("ny", N[:, 1]), ("nz", N[:, 2])]
    if UV is not None:
        UV = np.asarray(UV, np.float32).reshape(-1, 2)
        props += [("s", UV[:, 0]), ("t", UV[:, 1])]

    lines = ["ply", f"format {'binary_little_endian' if binary else 'ascii'} 1.0"]
    lines.append(f"element vertex {len(V)}")
    lines += [f"property float {name}" for name, _ in props]
    n_faces = 0 if F is None else len(F)
    lines.append(f"element face {n_faces}")
    lines.append("property list uchar int vertex_indices")
    lines.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode("ascii"))
        vdata = np.stack([v for _, v in props], -1).astype("<f4")
        if binary:
            f.write(vdata.tobytes())
            if n_faces:
                F = np.asarray(F, "<i4").reshape(-1, 3)
                rec = np.zeros(len(F), np.dtype([("n", "u1"), ("i", "<i4", 3)]))
                rec["n"] = 3
                rec["i"] = F
                f.write(rec.tobytes())
        else:
            for row in vdata:
                f.write((" ".join(f"{x:g}" for x in row) + "\n").encode())
            if n_faces:
                for face in np.asarray(F, np.int64).reshape(-1, 3):
                    f.write(f"3 {face[0]} {face[1]} {face[2]}\n".encode())
