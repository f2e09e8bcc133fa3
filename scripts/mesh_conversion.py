"""Batch STL -> OBJ mesh conversion (the reference's scripts/mesh_conversion.py).

Gated on `trimesh` (not available in the minimal image). Usage:
    python scripts/mesh_conversion.py --input-dir path/to/stls --output-dir out/
"""

import os
import sys
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class MeshConversionConfig:
    input_dir: str = "."
    output_dir: str = "."
    preview: bool = False


def main(cfg: MeshConversionConfig) -> None:
    try:
        import trimesh
    except ImportError:
        raise SystemExit("mesh conversion requires `trimesh` (pip install trimesh)")

    os.makedirs(cfg.output_dir, exist_ok=True)
    stls = sorted(Path(cfg.input_dir).glob("*.stl"))
    if not stls:
        print(f"no .stl files under {cfg.input_dir}")
        return
    for stl in stls:
        mesh = trimesh.load(stl)
        if cfg.preview:
            mesh.show()
        out = Path(cfg.output_dir) / (stl.stem + ".obj")
        mesh.export(out)
        print(f"{stl} -> {out}")


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(MeshConversionConfig))
