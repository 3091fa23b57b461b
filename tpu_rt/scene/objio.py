"""Wavefront OBJ + MTL import (host, numpy).

Behavioral parity with the reference importer
(src/framework/io/MeshWavefrontIO.cc:449-469 and helpers), re-implemented
vectorized where it matters:

- ``v``/``vn`` positions and normals; ``vt`` texcoords with the V flip
  (MeshWavefrontIO.cc:286-299).
- Faces of any arity triangulated as a fan (MeshWavefrontIO.cc:310-363);
  index forms ``p``, ``p/t``, ``p//n``, ``p/t/n``; negative (relative)
  indices.
- Vertex dedup on the (position, texcoord, normal) index triple
  (MeshWavefrontIO.cc:339-349).
- ``usemtl``/``mtllib`` split faces into one submesh per material
  (MeshWavefrontIO.cc:364-396); MTL ``Ka/Kd/Ks/d/Ns`` + texture map names
  parsed (MeshWavefrontIO.cc:131-243).
- Unknown-but-harmless directives ignored (MeshWavefrontIO.cc:398-430).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Material:
    """Submesh material (reference Mesh.hh:82-98 Material)."""

    name: str = "default"
    diffuse: np.ndarray = field(default_factory=lambda: np.array([0.75, 0.75, 0.75, 1.0], np.float32))
    specular: np.ndarray = field(default_factory=lambda: np.array([0.5, 0.5, 0.5], np.float32))
    glossiness: float = 32.0
    displacement_coef: float = 0.0
    displacement_bias: float = 0.0
    textures: dict = field(default_factory=dict)  # kind -> filename


@dataclass
class Mesh:
    """Indexed triangle mesh with per-material submeshes.

    positions: [V,3] f32; normals/texcoords optional, same V.
    submeshes: list of ([T_i,3] int32 index arrays); materials parallel list.
    """

    positions: np.ndarray
    normals: np.ndarray | None
    texcoords: np.ndarray | None
    submeshes: list
    materials: list

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(sum(s.shape[0] for s in self.submeshes))

    def flat_indices(self) -> np.ndarray:
        if not self.submeshes:
            return np.zeros((0, 3), np.int32)
        return np.concatenate([s.reshape(-1, 3) for s in self.submeshes]).astype(np.int32)

    def bbox(self):
        lo = self.positions.min(axis=0)
        hi = self.positions.max(axis=0)
        return lo.astype(np.float32), hi.astype(np.float32)

    def recompute_normals(self) -> None:
        """Area-weighted vertex normals (reference MeshBase::recomputeNormals,
        src/framework/3d/Mesh.cc:402)."""
        idx = self.flat_indices()
        p = self.positions
        fn = np.cross(p[idx[:, 1]] - p[idx[:, 0]], p[idx[:, 2]] - p[idx[:, 0]])
        acc = np.zeros_like(p)
        for k in range(3):
            np.add.at(acc, idx[:, k], fn)
        norms = np.linalg.norm(acc, axis=1, keepdims=True)
        self.normals = (acc / np.maximum(norms, 1e-30)).astype(np.float32)

    def _remap_vertices(self, remap: np.ndarray, keep: np.ndarray) -> None:
        """Apply a vertex remap + keep mask to all attributes and indices."""
        self.positions = np.ascontiguousarray(self.positions[keep])
        if self.normals is not None:
            self.normals = np.ascontiguousarray(self.normals[keep])
        if self.texcoords is not None:
            self.texcoords = np.ascontiguousarray(self.texcoords[keep])
        self.submeshes = [remap[s].astype(np.int32) for s in self.submeshes]

    def clean(self) -> None:
        """Remove degenerate triangles, empty submeshes, and unreferenced
        vertices (reference MeshBase::clean, src/framework/3d/Mesh.cc:460).
        Vectorized: mask instead of the reference's in-place compaction."""
        subs, mats = [], []
        for s, m in zip(self.submeshes, self.materials):
            s = s.reshape(-1, 3)
            ok = (s[:, 0] != s[:, 1]) & (s[:, 0] != s[:, 2]) & (s[:, 1] != s[:, 2])
            s = s[ok]
            if s.shape[0]:
                subs.append(np.ascontiguousarray(s.astype(np.int32)))
                mats.append(m)
        self.submeshes, self.materials = subs, mats
        used = np.zeros(self.num_vertices, bool)
        idx = self.flat_indices()
        used[idx.reshape(-1)] = True
        remap = np.cumsum(used, dtype=np.int64) - 1
        self._remap_vertices(remap, used)

    def collapse_vertices(self) -> None:
        """Collapse vertices whose full attribute tuples are identical
        (reference MeshBase::collapseVertices, Mesh.cc:538).  The reference
        hashes the raw vertex bytes; here np.unique over the stacked
        attribute rows plays that role."""
        cols = [self.positions]
        if self.normals is not None:
            cols.append(self.normals)
        if self.texcoords is not None:
            cols.append(self.texcoords)
        key = np.concatenate([c.reshape(self.num_vertices, -1) for c in cols],
                             axis=1)
        _, first, inverse = np.unique(key, axis=0, return_index=True,
                                      return_inverse=True)
        inverse = np.asarray(inverse).reshape(-1)
        # Keep first occurrences in original order (stable like the ref).
        order = np.argsort(first, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        keep = np.zeros(self.num_vertices, bool)
        keep[first] = True
        remap = rank[inverse]
        self._remap_vertices(remap, keep)
        self.clean()

    def simplify(self, max_error: float) -> None:
        """Collapse short edges; no vertex drifts more than ``max_error``
        from its original position (reference MeshBase::simplify,
        Mesh.cc:643).  Idiomatic re-design: iterative rounds of
        independent-set shortest-edge collapses with area-weighted
        positions and accumulated drift tracking, instead of the
        reference's BinaryHeap + linked edge lists — same contract
        (bounded drift, degenerate faces cleaned afterwards)."""
        if self.num_vertices == 0:
            return
        v = self.num_vertices
        parent = np.arange(v)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return int(i)

        pos = self.positions.astype(np.float32).copy()
        err = np.zeros(v, np.float32)   # accumulated drift bound per group
        for _ in range(16):             # rounds until no collapse applies
            idx = self.flat_indices()
            fa = np.fromiter((find(i) for i in idx.reshape(-1)),
                             np.int64, idx.size).reshape(-1, 3)
            p0, p1, p2 = pos[fa[:, 0]], pos[fa[:, 1]], pos[fa[:, 2]]
            area = np.maximum(
                np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1), 1e-8)
            w = np.zeros(v, np.float32)
            for k in range(3):
                np.add.at(w, fa[:, k], area.astype(np.float32))
            edges = np.concatenate([fa[:, [0, 1]], fa[:, [1, 2]],
                                    fa[:, [2, 0]]])
            edges = edges[edges[:, 0] != edges[:, 1]]
            if edges.shape[0] == 0:
                break
            edges = np.unique(np.sort(edges, axis=1), axis=0)
            elen = np.linalg.norm(pos[edges[:, 0]] - pos[edges[:, 1]],
                                  axis=1)
            order = np.argsort(elen, kind="stable")
            busy = np.zeros(v, bool)
            collapsed = 0
            for e in order:
                a, b = find(int(edges[e, 0])), find(int(edges[e, 1]))
                if a == b or busy[a] or busy[b]:
                    continue
                wa, wb = float(w[a]), float(w[b])
                tgt = (pos[a] * wa + pos[b] * wb) / max(wa + wb, 1e-30)
                # Triangle-inequality drift bound: every original vertex
                # in either group has drifted at most err + |move|.
                ea = err[a] + float(np.linalg.norm(tgt - pos[a]))
                eb = err[b] + float(np.linalg.norm(tgt - pos[b]))
                if max(ea, eb) > max_error:
                    continue
                busy[a] = busy[b] = True
                parent[b] = a
                pos[a] = tgt.astype(np.float32)
                err[a] = max(ea, eb)
                w[a] = wa + wb
                collapsed += 1
            if not collapsed:
                break
        roots = np.fromiter((find(i) for i in range(v)), np.int64, v)
        self.positions = pos[roots].astype(np.float32)
        self.submeshes = [roots[s].astype(np.int32) for s in self.submeshes]
        # positions now duplicated per original id; clean() drops
        # degenerates and unreferenced copies.
        self.clean()
        if self.normals is not None:
            self.recompute_normals()


_IGNORED_DIRECTIVES = {
    # Directives the reference silently skips (MeshWavefrontIO.cc:398-430).
    "vp", "deg", "bmat", "step", "cstype", "p", "l", "curv", "curv2", "surf",
    "parm", "trim", "hole", "scrv", "sp", "end", "con", "g", "s", "mg", "o",
    "bevel", "c_interp", "d_interp", "lod", "shadow_obj", "trace_obj",
    "ctech", "stech",
}

_MTL_TEXTURE_KEYS = {
    "map_kd": "diffuse", "map_ks": "specular", "map_d": "alpha",
    "map_bump": "displacement", "bump": "displacement", "disp": "displacement",
    "refl": "environment", "map_ka": "ambient", "map_ns": "glossiness",
}


def _parse_mtl(path: str, materials: dict) -> None:
    if not os.path.exists(path):
        return
    cur: Material | None = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            tokens = line.split()
            if not tokens or tokens[0].startswith("#"):
                continue
            key = tokens[0].lower()
            try:
                if key == "newmtl":
                    name = tokens[1] if len(tokens) > 1 else ""
                    cur = materials.setdefault(name, Material(name=name))
                elif cur is None:
                    continue
                elif key == "kd":
                    vals = [float(v) for v in tokens[1:4]]
                    cur.diffuse = np.array(vals + [float(cur.diffuse[3])], np.float32)
                elif key == "ks":
                    cur.specular = np.array([float(v) for v in tokens[1:4]], np.float32)
                elif key == "d":
                    cur.diffuse = cur.diffuse.copy()
                    cur.diffuse[3] = float(tokens[1])
                elif key == "ns":
                    cur.glossiness = float(tokens[1])
                elif key in _MTL_TEXTURE_KEYS:
                    cur.textures[_MTL_TEXTURE_KEYS[key]] = " ".join(tokens[1:])
            except (ValueError, IndexError):
                continue  # reference tolerates malformed material rows


def _parse_index(token: str, counts: tuple[int, int, int]) -> tuple[int, int, int]:
    """Parse one face corner 'p', 'p/t', 'p//n', 'p/t/n' to 0-based
    (pos, tex, nrm) with -1 for absent; negative indices are relative."""
    parts = token.split("/")
    out = [-1, -1, -1]
    for i in range(min(3, len(parts))):
        s = parts[i]
        if not s:
            continue
        v = int(s)
        out[i] = v - 1 if v > 0 else counts[i] + v
    return out[0], out[1], out[2]


def import_wavefront_mesh(path: str) -> Mesh:
    positions: list = []
    texcoords: list = []
    normals: list = []

    materials: dict[str, Material] = {}
    submesh_indices: dict[str, list] = {}
    current_mtl = ""

    # Output vertex welding: (p,t,n) triple -> output index.
    vertex_map: dict[tuple[int, int, int], int] = {}
    out_pos: list = []
    out_tex: list = []
    out_nrm: list = []
    any_tex = False
    any_nrm = False

    def corner(token: str) -> int:
        nonlocal any_tex, any_nrm
        key = _parse_index(token, (len(positions), len(texcoords), len(normals)))
        existing = vertex_map.get(key)
        if existing is not None:
            return existing
        p, t, n = key
        out_idx = len(out_pos)
        vertex_map[key] = out_idx
        out_pos.append(positions[p])
        out_tex.append(texcoords[t] if 0 <= t < len(texcoords) else (0.0, 0.0))
        out_nrm.append(normals[n] if 0 <= n < len(normals) else (0.0, 0.0, 0.0))
        if t >= 0:
            any_tex = True
        if n >= 0:
            any_nrm = True
        return out_idx

    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "r", errors="replace") as f:
        for line in f:
            tokens = line.split()
            if not tokens or tokens[0].startswith("#"):
                continue
            key = tokens[0]
            if key == "v":
                positions.append((float(tokens[1]), float(tokens[2]), float(tokens[3])))
            elif key == "vt":
                # Reference flips V (MeshWavefrontIO.cc:293).
                u = float(tokens[1])
                v = float(tokens[2]) if len(tokens) > 2 else 0.0
                texcoords.append((u, 1.0 - v))
            elif key == "vn":
                normals.append((float(tokens[1]), float(tokens[2]), float(tokens[3])))
            elif key == "f":
                if len(tokens) < 4:
                    continue
                idxs = [corner(t) for t in tokens[1:]]
                tris = submesh_indices.setdefault(current_mtl, [])
                for i in range(1, len(idxs) - 1):  # fan triangulation
                    tris.append((idxs[0], idxs[i], idxs[i + 1]))
            elif key == "usemtl":
                current_mtl = tokens[1] if len(tokens) > 1 else ""
            elif key == "mtllib":
                _parse_mtl(os.path.join(base_dir, " ".join(tokens[1:])), materials)
            elif key.lower() in _IGNORED_DIRECTIVES:
                continue
            # Anything else: skip silently (reference warns once; we tolerate).

    submeshes = []
    mats = []
    for name, tris in submesh_indices.items():
        if not tris:
            continue
        submeshes.append(np.asarray(tris, np.int32))
        mats.append(materials.get(name, Material(name=name or "default")))

    mesh = Mesh(
        positions=np.asarray(out_pos, np.float32).reshape(-1, 3),
        normals=np.asarray(out_nrm, np.float32).reshape(-1, 3) if any_nrm else None,
        texcoords=np.asarray(out_tex, np.float32).reshape(-1, 2) if any_tex else None,
        submeshes=submeshes,
        materials=mats,
    )
    return mesh


def export_wavefront_mesh(mesh: Mesh, path: str) -> None:
    """Minimal OBJ writer (round-trip testing + interchange)."""
    with open(path, "w") as f:
        f.write("# tpu_rt OBJ export\n")
        mtl_path = os.path.splitext(path)[0] + ".mtl"
        f.write(f"mtllib {os.path.basename(mtl_path)}\n")
        for p in mesh.positions:
            f.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        if mesh.normals is not None:
            for n in mesh.normals:
                f.write(f"vn {n[0]:.9g} {n[1]:.9g} {n[2]:.9g}\n")
        has_n = mesh.normals is not None
        for sub, mat in zip(mesh.submeshes, mesh.materials):
            f.write(f"usemtl {mat.name}\n")
            for tri in sub:
                if has_n:
                    f.write("f " + " ".join(f"{i + 1}//{i + 1}" for i in tri) + "\n")
                else:
                    f.write("f " + " ".join(str(i + 1) for i in tri) + "\n")
    with open(mtl_path, "w") as f:
        for mat in mesh.materials:
            f.write(f"newmtl {mat.name}\n")
            f.write(f"Kd {mat.diffuse[0]:.6g} {mat.diffuse[1]:.6g} {mat.diffuse[2]:.6g}\n")
            f.write(f"Ks {mat.specular[0]:.6g} {mat.specular[1]:.6g} {mat.specular[2]:.6g}\n")
            f.write(f"Ns {mat.glossiness:.6g}\nd {mat.diffuse[3]:.6g}\n")
