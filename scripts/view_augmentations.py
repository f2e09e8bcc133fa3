"""Augmentation preview: write augmented dataset samples to disk for eyeballing.

The reference embeds an interactive cv2 preview loop in `argus/data.py`'s
`__main__` block; this is the headless equivalent — it saves side-by-side
original/augmented strips so the augmentation distribution can be inspected.

    python scripts/view_augmentations.py --dataset-path outputs/data/cube_unity_data
"""

import os
import sys
from dataclasses import dataclass, field

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_tpu import ROOT  # noqa: E402
from argus_tpu.ops.augment import AugmentationConfig  # noqa: E402


@dataclass
class ViewConfig:
    dataset_path: str
    augmentation_config: AugmentationConfig = field(default_factory=AugmentationConfig)
    n_examples: int = 8
    seed: int = 0
    output_dir: str = os.path.join(ROOT, "outputs", "augmentation_previews")


def main(cfg: ViewConfig) -> None:
    import jax
    from PIL import Image

    from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig
    from argus_tpu.ops.augment import apply_augmentation
    from argus_tpu.ops.image import u8_to_f32

    ds_cfg = CameraCubePoseDatasetConfig(cfg.dataset_path)
    dataset = CameraCubePoseDataset(ds_cfg, train=True)
    os.makedirs(cfg.output_dir, exist_ok=True)

    n = min(cfg.n_examples, len(dataset))
    raw = dataset.load_images_batch(list(range(n)))  # (n, H, W, 6)
    import jax.numpy as jnp

    images = u8_to_f32(jnp.asarray(raw))
    augmented = apply_augmentation(
        cfg.augmentation_config, jax.random.PRNGKey(cfg.seed), images, n_cams=dataset.n_cams
    )
    aug_np = np.asarray(jnp.clip(augmented, 0, 1) * 255).astype(np.uint8)

    for i in range(n):
        # strip: [cam1 raw | cam1 aug | cam2 raw | cam2 aug]
        panels = []
        for cam in range(dataset.n_cams):
            panels.append(raw[i, :, :, 3 * cam : 3 * cam + 3])
            panels.append(aug_np[i, :, :, 3 * cam : 3 * cam + 3])
        strip = np.concatenate(panels, axis=1)
        Image.fromarray(strip).save(os.path.join(cfg.output_dir, f"preview_{i}.png"))
    print(f"wrote {n} previews to {cfg.output_dir}")


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(ViewConfig))
