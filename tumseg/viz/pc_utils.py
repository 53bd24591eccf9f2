"""Point-cloud render/IO utilities: PLY read/write, cloud<->volume
conversion, euler rotations, and gaussian-disk three-view renders.

Capability parity with /root/reference/visualizer/pc_utils.py (which vendors
python-plyfile and NiBabel's eulerangles); here the PLY codec is a small
self-contained implementation (ascii + binary_little_endian vertex
elements) and the renderers are vectorized NumPy.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# ----------------------------------------------------------------------
# Euler angles (z-y-x intrinsic, matching eulerangles.euler2mat semantics)
# ----------------------------------------------------------------------

def euler2mat(z: float = 0, y: float = 0, x: float = 0) -> np.ndarray:
    """Rotation matrix for intrinsic rotations about z, then y, then x."""
    mats = []
    if z:
        c, s = np.cos(z), np.sin(z)
        mats.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]))
    if y:
        c, s = np.cos(y), np.sin(y)
        mats.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]))
    if x:
        c, s = np.cos(x), np.sin(x)
        mats.append(np.array([[1, 0, 0], [0, c, -s], [0, s, c]]))
    out = np.eye(3)
    for m in mats:
        out = out @ m
    return out


# ----------------------------------------------------------------------
# Cloud <-> volume
# ----------------------------------------------------------------------

def point_cloud_to_volume(points: np.ndarray, vsize: int,
                          radius: float = 1.0) -> np.ndarray:
    """[N,3] points in [-radius, radius] -> binary occupancy [vsize]^3."""
    vol = np.zeros((vsize, vsize, vsize))
    voxel = 2 * radius / float(vsize)
    locations = ((points + radius) / voxel).astype(int)
    locations = np.clip(locations, 0, vsize - 1)
    vol[locations[:, 0], locations[:, 1], locations[:, 2]] = 1.0
    return vol


def point_cloud_to_volume_batch(point_clouds: np.ndarray, vsize: int = 12,
                                radius: float = 1.0, flatten: bool = True):
    vols = [point_cloud_to_volume(pc, vsize, radius) for pc in point_clouds]
    if flatten:
        return np.vstack([v.flatten() for v in vols])
    return np.stack(vols)[..., None]


def volume_to_point_cloud(vol: np.ndarray) -> np.ndarray:
    """Occupancy grid -> [N,3] voxel coordinates (vectorized)."""
    return np.argwhere(vol == 1).astype(np.float64)


# ----------------------------------------------------------------------
# PLY IO (self-contained: ascii + binary_little_endian, vertex element)
# ----------------------------------------------------------------------

_PLY_TYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> np.ndarray:
    """Read the vertex element of a PLY file -> [N, 3] xyz array."""
    data = read_ply_full(path)
    v = data["vertex"]
    return np.stack([v["x"], v["y"], v["z"]], axis=1)


def read_ply_full(path: str) -> Dict[str, np.ndarray]:
    """Parse all elements of an ascii/binary_little_endian PLY file into
    structured arrays keyed by element name."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements: List[Tuple[str, int, List[Tuple[str, str]]]] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated header")
            parts = line.decode("ascii").strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    raise ValueError("list properties not supported")
                elements[-1][2].append((parts[2], _PLY_TYPES[parts[1]]))
            elif parts[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"unsupported PLY format {fmt}")

        out = {}
        if fmt == "binary_little_endian":
            for name, count, props in elements:
                dtype = np.dtype([(p, "<" + t) for p, t in props])
                out[name] = np.frombuffer(f.read(dtype.itemsize * count),
                                          dtype=dtype, count=count)
        else:
            body = f.read().decode("ascii").split()
            pos = 0
            for name, count, props in elements:
                ncol = len(props)
                chunk = np.array(body[pos:pos + count * ncol], dtype=np.float64)
                pos += count * ncol
                chunk = chunk.reshape(count, ncol)
                rec = np.zeros(count, dtype=[(p, t) for p, t in props])
                for i, (p, _) in enumerate(props):
                    rec[p] = chunk[:, i]
                out[name] = rec
        return out


def write_ply(points: np.ndarray, filename: str, text: bool = True) -> None:
    """Write [N,3] xyz to a PLY file (ascii by default, like the reference's
    write_ply at pc_utils.py:86-91; binary_little_endian otherwise)."""
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    header = ["ply",
              "format %s 1.0" % ("ascii" if text else "binary_little_endian"),
              "comment vertices",
              f"element vertex {n}",
              "property float x", "property float y", "property float z",
              "end_header"]
    with open(filename, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if text:
            for p in points:
                f.write((f"{p[0]} {p[1]} {p[2]}\n").encode("ascii"))
        else:
            f.write(points.astype("<f4").tobytes())


# ----------------------------------------------------------------------
# Gaussian-disk renders
# ----------------------------------------------------------------------

def draw_point_cloud(input_points: np.ndarray, canvasSize: int = 500,
                     space: int = 200, diameter: int = 25, xrot: float = 0,
                     yrot: float = 0, zrot: float = 0,
                     switch_xyz=(0, 1, 2), normalize: bool = True) -> np.ndarray:
    """Render a cloud to a grayscale [canvasSize]^2 image with back-to-front
    gaussian-disk splats and exponential depth blending (pc_utils.py:98-155
    semantics, vectorized splat precompute)."""
    image = np.zeros((canvasSize, canvasSize))
    if input_points is None or input_points.shape[0] == 0:
        return image

    points = input_points[:, list(switch_xyz)].astype(np.float64)
    points = points @ euler2mat(zrot, yrot, xrot).T

    if normalize:
        points = points - points.mean(axis=0)
        furthest = np.sqrt((points ** 2).sum(axis=1)).max()
        points = points / max(furthest, 1e-12)

    radius = (diameter - 1) / 2.0
    ii, jj = np.meshgrid(np.arange(diameter), np.arange(diameter),
                         indexing="ij")
    rr = (ii - radius) ** 2 + (jj - radius) ** 2
    disk = np.where(rr <= radius ** 2,
                    np.exp(-rr / (radius ** 2)), 0.0)
    mask = np.argwhere(disk > 0)
    dx, dy = mask[:, 0], mask[:, 1]
    dv = disk[disk > 0]

    order = np.argsort(points[:, 2])
    points = points[order]
    z = points[:, 2]
    z = (z - z.min()) / max(z.max() - z.min(), 1e-12)
    max_depth = z.max()

    centers = np.round(canvasSize / 2 + points[:, :2] * space).astype(int)
    # paint far-to-near (reference iterates j from the nearest down)
    for j in range(points.shape[0] - 1, -1, -1):
        px = dx + centers[j, 0]
        py = dy + centers[j, 1]
        ok = (px >= 0) & (px < canvasSize) & (py >= 0) & (py < canvasSize)
        image[px[ok], py[ok]] = (image[px[ok], py[ok]] * 0.7
                                 + dv[ok] * (max_depth - z[j]) * 0.3)

    m = image.max()
    return image / m if m > 0 else image


def point_cloud_three_views(points: np.ndarray) -> np.ndarray:
    """Three standard views concatenated to a 500x1500 gray image
    (pc_utils.py:158-169)."""
    deg = np.pi / 180.0
    img1 = draw_point_cloud(points, zrot=110 * deg, xrot=45 * deg, yrot=0)
    img2 = draw_point_cloud(points, zrot=70 * deg, xrot=135 * deg, yrot=0)
    img3 = draw_point_cloud(points, zrot=180 * deg, xrot=90 * deg, yrot=0)
    return np.concatenate([img1, img2, img3], axis=1)
