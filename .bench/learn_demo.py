import sys, tempfile; sys.path.insert(0, "/root/repo")
import numpy as np
from argus_tpu.data.synthetic import write_synthetic_dataset
from argus_tpu.data import CameraCubePoseDatasetConfig
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import TrainConfig, train

d = tempfile.mkdtemp(prefix="argus_learn_")
write_synthetic_dataset(d, n_train=192, n_test=32, height=256, width=256, seed=0, pose_encoded=True)
cfg = TrainConfig(
    dataset_config=CameraCubePoseDatasetConfig(d, center_crop=(256, 256)),
    model_config=NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=256),
    augmentation_config=AugmentationConfig(num_spaghetti=3),
    batch_size=32, learning_rate=3e-4, n_epochs=10,
    val_epochs=2, print_epochs=2, save_epochs=10,
    amp=True, num_workers=4, wandb_log=False, val_spaghetti=False,
    save_dir=tempfile.mkdtemp(prefix="argus_models_"),
)
ckpt = train(cfg)
print("done:", ckpt, flush=True)
