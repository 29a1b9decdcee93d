"""Minimal GLB writer for test fixtures.

Builds small glTF 2.0 binary scenes (meshes with POSITION/NORMAL/TEXCOORD_0,
u16 or u32 indices, PBR materials with the KHR emissive-strength / ior
extensions, punctual lights, perspective cameras, optional embedded PNG
textures) so tests can exercise every loader path without shipping binary
fixtures. This also acts as an independent check of the parser: writer and
reader were implemented against the spec, not against each other."""

from __future__ import annotations

import io
import json
import struct

import numpy as np


def _align(b: bytearray, alignment: int, pad: bytes = b"\x00") -> None:
    while len(b) % alignment:
        b.extend(pad)


class GlbBuilder:
    def __init__(self):
        self.bin = bytearray()
        self.buffer_views = []
        self.accessors = []
        self.meshes = []
        self.materials = []
        self.nodes = []
        self.cameras = []
        self.lights = []
        self.textures = []
        self.images = []

    def _add_view(self, data: bytes, target=None) -> int:
        _align(self.bin, 4)
        view = {"buffer": 0, "byteOffset": len(self.bin),
                "byteLength": len(data)}
        if target:
            view["target"] = target
        self.bin.extend(data)
        self.buffer_views.append(view)
        return len(self.buffer_views) - 1

    def _add_accessor(self, arr: np.ndarray, comp_type: int, type_: str,
                      target=None, normalized=False) -> int:
        view = self._add_view(arr.tobytes(), target)
        acc = {
            "bufferView": view,
            "componentType": comp_type,
            "count": arr.shape[0],
            "type": type_,
        }
        if normalized:
            acc["normalized"] = True
        if type_ == "VEC3" and comp_type == 5126:
            acc["min"] = arr.min(axis=0).tolist()
            acc["max"] = arr.max(axis=0).tolist()
        self.accessors.append(acc)
        return len(self.accessors) - 1

    def add_material(self, color=(1, 1, 1, 1), metallic=0.0, roughness=0.5,
                     emission=None, ior=None, texture=None) -> int:
        mat = {
            "pbrMetallicRoughness": {
                "baseColorFactor": list(color),
                "metallicFactor": metallic,
                "roughnessFactor": roughness,
            }
        }
        ext = {}
        if emission is not None:
            ext["KHR_materials_emissive_strength"] = {
                "emissiveStrength": emission
            }
        if ior is not None:
            ext["KHR_materials_ior"] = {"ior": ior}
        if ext:
            mat["extensions"] = ext
        if texture is not None:
            mat["pbrMetallicRoughness"]["baseColorTexture"] = {
                "index": texture
            }
        self.materials.append(mat)
        return len(self.materials) - 1

    def add_texture_rgba(self, pixels: np.ndarray) -> int:
        """pixels: [H,W,4] uint8, embedded as PNG in the BIN chunk."""
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(pixels, "RGBA").save(buf, format="PNG")
        view = self._add_view(buf.getvalue())
        self.images.append({"bufferView": view, "mimeType": "image/png"})
        self.textures.append({"source": len(self.images) - 1})
        return len(self.textures) - 1

    def add_mesh(self, primitives) -> int:
        """primitives: list of (positions[N,3], normals[N,3], uvs[N,2]|None,
        indices[I], material_index, index_dtype)."""
        prims = []
        for pos, nrm, uv, idx, mat, idx_dtype in primitives:
            attrs = {
                "POSITION": self._add_accessor(
                    np.asarray(pos, np.float32), 5126, "VEC3", 34962
                ),
                "NORMAL": self._add_accessor(
                    np.asarray(nrm, np.float32), 5126, "VEC3", 34962
                ),
            }
            if uv is not None:
                attrs["TEXCOORD_0"] = self._add_accessor(
                    np.asarray(uv, np.float32), 5126, "VEC2", 34962
                )
            comp = {np.uint16: 5123, np.uint32: 5125}[idx_dtype]
            prims.append(
                {
                    "attributes": attrs,
                    "indices": self._add_accessor(
                        np.asarray(idx, idx_dtype), comp, "SCALAR", 34963
                    ),
                    "material": mat,
                }
            )
        self.meshes.append({"primitives": prims})
        return len(self.meshes) - 1

    def add_node(self, mesh=None, camera=None, light=None, translation=None,
                 rotation=None, scale=None, matrix=None) -> int:
        node = {}
        if mesh is not None:
            node["mesh"] = mesh
        if camera is not None:
            node["camera"] = camera
        if light is not None:
            node["extensions"] = {"KHR_lights_punctual": {"light": light}}
        if matrix is not None:
            node["matrix"] = list(matrix)
        else:
            if translation is not None:
                node["translation"] = list(translation)
            if rotation is not None:
                node["rotation"] = list(rotation)
            if scale is not None:
                node["scale"] = list(scale)
        self.nodes.append(node)
        return len(self.nodes) - 1

    def add_camera(self, aspect, yfov, znear=0.1, zfar=100.0) -> int:
        self.cameras.append(
            {
                "type": "perspective",
                "perspective": {
                    "aspectRatio": aspect,
                    "yfov": yfov,
                    "znear": znear,
                    "zfar": zfar,
                },
            }
        )
        return len(self.cameras) - 1

    def add_light(self, color=(1, 1, 1), intensity=100.0) -> int:
        self.lights.append(
            {"color": list(color), "intensity": intensity, "type": "point"}
        )
        return len(self.lights) - 1

    def to_glb(self) -> bytes:
        doc = {
            "asset": {"version": "2.0", "generator": "raytpu-test-writer"},
            "scene": 0,
            "scenes": [{"nodes": list(range(len(self.nodes)))}],
            "nodes": self.nodes,
            "meshes": self.meshes,
            "materials": self.materials,
            "accessors": self.accessors,
            "bufferViews": self.buffer_views,
            "buffers": [{"byteLength": len(self.bin)}],
        }
        exts = []
        if self.lights:
            doc["extensions"] = {
                "KHR_lights_punctual": {"lights": self.lights}
            }
            exts.append("KHR_lights_punctual")
        if self.cameras:
            doc["cameras"] = self.cameras
        if self.textures:
            doc["textures"] = self.textures
            doc["images"] = self.images
        if any("KHR_materials_emissive_strength" in m.get("extensions", {})
               for m in self.materials):
            exts.append("KHR_materials_emissive_strength")
        if any("KHR_materials_ior" in m.get("extensions", {})
               for m in self.materials):
            exts.append("KHR_materials_ior")
        if exts:
            doc["extensionsUsed"] = exts

        json_bytes = bytearray(json.dumps(doc).encode())
        _align(json_bytes, 4, b" ")
        bin_bytes = bytearray(self.bin)
        _align(bin_bytes, 4)
        total = 12 + 8 + len(json_bytes) + 8 + len(bin_bytes)
        out = bytearray()
        out.extend(struct.pack("<III", 0x46546C67, 2, total))
        out.extend(struct.pack("<I", len(json_bytes)))
        out.extend(b"JSON")
        out.extend(json_bytes)
        out.extend(struct.pack("<I", len(bin_bytes)))
        out.extend(b"BIN\x00")
        out.extend(bin_bytes)
        return bytes(out)

    def write(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.to_glb())

    def write_gltf(self, path: str) -> None:
        """Write as .gltf JSON + sibling .bin (the reference resolves the
        binary as <stem>.bin, src/main.rs:149)."""
        import os

        glb = self.to_glb()
        # reuse to_glb's document, but point the buffer at the .bin file
        doc_len = struct.unpack_from("<I", glb, 12)[0]
        doc = json.loads(glb[20 : 20 + doc_len])
        bin_path = os.path.splitext(path)[0] + ".bin"
        doc["buffers"] = [
            {
                "byteLength": len(self.bin),
                "uri": os.path.basename(bin_path),
            }
        ]
        with open(path, "w") as f:
            json.dump(doc, f)
        with open(bin_path, "wb") as f:
            f.write(bytes(self.bin))


def quad(size=1.0, z=0.0):
    """Unit XY quad at depth z: positions, normals, uvs, indices."""
    s = size
    pos = np.array(
        [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32
    )
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    return pos, nrm, uv, idx


def box(size=1.0):
    """Axis-aligned cube with per-face normals (24 verts / 36 indices,
    like Blender's cube export)."""
    s = size
    faces = []
    for axis in range(3):
        for sign in (1.0, -1.0):
            n = np.zeros(3, np.float32)
            n[axis] = sign
            u = np.zeros(3, np.float32)
            u[(axis + 1) % 3] = 1.0
            v = np.cross(n, u)
            c = n * s
            quad_pos = [
                c - u * s - v * s, c + u * s - v * s,
                c + u * s + v * s, c - u * s + v * s,
            ]
            faces.append((np.array(quad_pos, np.float32), n))
    pos = np.concatenate([f[0] for f in faces])
    nrm = np.concatenate([np.tile(f[1], (4, 1)) for f in faces])
    uv = np.tile(
        np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32), (6, 1)
    )
    idx = np.concatenate(
        [np.array([0, 1, 2, 0, 2, 3], np.uint32) + 4 * i for i in range(6)]
    )
    return pos.astype(np.float32), nrm.astype(np.float32), uv, idx
