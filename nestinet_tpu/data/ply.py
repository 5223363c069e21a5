"""Minimal PLY reader/writer.

Capability parity with the vendored parser the reference carries
(`utils/plyfile.py`, used by `utils/pc_util.py:80-98` for point-cloud
IO): reads ascii / binary_little_endian / binary_big_endian vertex and
face data into numpy arrays; writes point clouds (optionally with
normals) and triangle meshes.  Not a general-purpose PLY library — it
covers the framework's needs with ~150 lines instead of vendoring 900.
"""

from __future__ import annotations

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> dict:
    """Parse a PLY file -> {element_name: structured array or dict}.

    Vertices come back as a structured array (fields = properties);
    faces (list properties) come back as an [F, 3] int array when
    triangular, else a list of index lists.
    """
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"not a PLY file: {path}")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) or ('list', ...)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            tokens = line.strip().split()
            if not tokens or tokens[0] == b"comment":
                continue
            if tokens[0] == b"format":
                fmt = tokens[1].decode()
            elif tokens[0] == b"element":
                elements.append([tokens[1].decode(), int(tokens[2]), []])
            elif tokens[0] == b"property":
                if tokens[1] == b"list":
                    elements[-1][2].append(
                        ("list", tokens[4].decode(),
                         _PLY_DTYPES[tokens[2].decode()],
                         _PLY_DTYPES[tokens[3].decode()])
                    )
                else:
                    elements[-1][2].append(
                        (tokens[2].decode(), _PLY_DTYPES[tokens[1].decode()])
                    )
            elif tokens[0] == b"end_header":
                break

        endian = {"binary_little_endian": "<", "binary_big_endian": ">"}.get(fmt, "")
        out = {}
        for name, count, props in elements:
            is_list = any(p[0] == "list" for p in props)
            if not is_list:
                dtype = np.dtype([(p[0], endian + p[1]) for p in props])
                if fmt == "ascii":
                    rows = [f.readline().split() for _ in range(count)]
                    arr = np.array(
                        [tuple(r) for r in rows],
                        dtype=[(p[0], p[1]) for p in props],
                    )
                else:
                    arr = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype)
                out[name] = arr
            else:
                # list property (faces)
                _, pname, cnt_t, idx_t = props[0]
                faces = []
                if fmt == "ascii":
                    for _ in range(count):
                        vals = f.readline().split()
                        n = int(vals[0])
                        faces.append([int(v) for v in vals[1 : 1 + n]])
                else:
                    cnt_dt = np.dtype(endian + cnt_t)
                    idx_dt = np.dtype(endian + idx_t)
                    for _ in range(count):
                        n = int(np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)[0])
                        faces.append(
                            np.frombuffer(f.read(n * idx_dt.itemsize), idx_dt).tolist()
                        )
                if faces and all(len(fc) == 3 for fc in faces):
                    out[name] = np.asarray(faces, dtype=np.int64)
                else:
                    out[name] = faces
        return out


def read_ply_points(path: str) -> np.ndarray:
    """[N, 3] xyz from a PLY file (parity: `pc_util.py:read_ply`)."""
    vert = read_ply(path)["vertex"]
    return np.stack([vert["x"], vert["y"], vert["z"]], axis=-1).astype(np.float32)


def write_ply(
    path: str,
    points: np.ndarray,
    *,
    normals: np.ndarray | None = None,
    faces: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    """Write points (+ optional normals, triangle faces) as PLY
    (parity: `pc_util.py:write_ply`)."""
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    props = ["property float x", "property float y", "property float z"]
    cols = [points]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
        cols.append(np.asarray(normals, dtype=np.float32))
    data = np.concatenate(cols, axis=1)

    header = ["ply"]
    header.append(
        "format binary_little_endian 1.0" if binary else "format ascii 1.0"
    )
    header.append(f"element vertex {n}")
    header += props
    if faces is not None:
        header.append(f"element face {len(faces)}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            f.write(np.ascontiguousarray(data, dtype="<f4").tobytes())
            if faces is not None:
                for face in np.asarray(faces, dtype="<i4"):
                    f.write(np.uint8(len(face)).tobytes())
                    f.write(face.tobytes())
        else:
            np.savetxt(f, data, fmt="%.7g")
            if faces is not None:
                for face in faces:
                    f.write((f"{len(face)} " + " ".join(map(str, face)) + "\n").encode())
