"""Named, insertion-ordered material registry.

Re-creates the reference's `MaterialCache`: a name-keyed, insertion-ordered
map (Rust `IndexMap`) whose *insertion order defines the material index*
used by the GPU buffers (`src/ray_trace_materials.rs:50-67`;
`get_index_of` -> index).  Python dicts are insertion-ordered, so the same
contract holds natively.  `to_materials()` lowers the registry to the SoA
`Materials` table with the reference's integer kind encoding
(`src/ray_trace_materials.rs:144-148`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from bevy_raytrace_tpu.core.types import (
    DIELECTRIC,
    LAMBERTIAN,
    METALLIC,
    Materials,
)

_KINDS = {"lambertian": LAMBERTIAN, "metallic": METALLIC, "dielectric": DIELECTRIC}


@dataclasses.dataclass
class MaterialSpec:
    """CPU-side material description (~ `RayTraceMaterial`,
    `src/ray_trace_materials.rs:25-31`)."""

    kind: str  # "lambertian" | "metallic" | "dielectric"
    color: tuple = (1.0, 1.0, 1.0)
    fuzz: float = 0.0
    ior: float = 1.5

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown material kind {self.kind!r}")


class MaterialRegistry:
    """Insertion-ordered name -> MaterialSpec registry."""

    def __init__(self):
        self._materials: Dict[str, MaterialSpec] = {}

    def insert(self, name: str, spec: MaterialSpec) -> int:
        """Insert (or overwrite) a named material; returns its index."""
        self._materials[name] = spec
        return self.get_index_of(name)

    def lambertian(self, name, color) -> int:
        return self.insert(name, MaterialSpec("lambertian", tuple(color)))

    def metallic(self, name, color, fuzz=0.0) -> int:
        return self.insert(name, MaterialSpec("metallic", tuple(color), fuzz=fuzz))

    def dielectric(self, name, ior=1.5) -> int:
        return self.insert(name, MaterialSpec("dielectric", ior=ior))

    def get_index_of(self, name: str) -> int:
        """Index = insertion order (`src/ray_trace_materials.rs:63-66`)."""
        return list(self._materials).index(name)

    def __len__(self):
        return len(self._materials)

    def __contains__(self, name):
        return name in self._materials

    def names(self):
        return list(self._materials)

    def to_materials(self) -> Materials:
        """Lower to the SoA device table."""
        specs = list(self._materials.values())
        if not specs:
            raise ValueError("empty material registry")
        return Materials(
            albedo=np.array([s.color for s in specs], np.float32),
            kind=np.array([_KINDS[s.kind] for s in specs], np.int32),
            fuzz=np.array([s.fuzz for s in specs], np.float32),
            ior=np.array([s.ior for s in specs], np.float32),
        )
