from ladine_tpu.data.constants import (
    ATTACK_NAMES,
    CALIBRATED_TEMPERATURE,
    IMAGE_SIZE,
    NORM_STATS,
    base_dataset,
    dataset_split_for,
)
from ladine_tpu.data.imagefolder import (
    ImageFolderDataset,
    compute_mean_std,
    load_attack_split,
    load_split,
)
from ladine_tpu.data.downloads import (
    MNIST_FAMILY,
    load_idx_split,
    load_mnist_family,
    load_pathmnist_split,
    read_idx,
)
from ladine_tpu.data.router import open_dataset
from ladine_tpu.data.synthetic import Gaussians, GaussianMixture1D, add_gaussian_noise
from ladine_tpu.data.arrays import (
    ArrayDataset,
    compose,
    normalize,
    random_rotate,
    repeat_channels,
    resize_to,
)
