"""Dataset-name routing shared by every CLI entry point.

The reference wires this ad hoc per script: mapping/data/dataset.py's
``data_loader`` branches on name for the ViT/MLP trainers, while
diffusion/dataset_helper/chest_x_ray_dataset.py serves the ImageFolder
trees (plus ``Test_attacks_{name}`` adversarial splits) to the diffusion
runner. One router here gives all three stages the same name surface:

* ``...Atk{FGSM,...}``     -> pre-generated adversarial ImageFolder split
* MNIST_FAMILY names       -> zero-egress idx/npz ingestion (downloads.py)
* anything else            -> ChestXRay-layout ImageFolder (imagefolder.py)
"""

from __future__ import annotations

from typing import Tuple

from ladine_tpu.data.constants import IMAGE_SIZE
from ladine_tpu.data.downloads import MNIST_FAMILY, load_mnist_family
from ladine_tpu.data.imagefolder import load_attack_split, load_split


def open_dataset(
    name: str,
    root: str,
    split: str,
    preprocess: str = "grayscaled",
    image_size: Tuple[int, int] = IMAGE_SIZE,
):
    """Open one split of any dataset the framework knows by name."""
    if "Atk" in name:
        return load_attack_split(root, name.split("Atk")[1], image_size)
    if name in MNIST_FAMILY:
        # PathMNIST supports grayscaled|none (dataset.py:172-210); any
        # non-grayscale request maps to 'none' (RGB as-is). The 1-channel
        # corpora are always grayscale->3ch.
        pre = "grayscaled" if preprocess == "grayscaled" else "none"
        return load_mnist_family(
            name, root, split,
            preprocess=pre if name == "PathMNIST" else "grayscaled",
            image_size=image_size,
        )
    return load_split(root, name, split, preprocess=preprocess,
                      image_size=image_size)
