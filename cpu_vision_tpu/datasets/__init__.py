"""Datasets: base classes, folder trees, MNIST/CIFAR families, FakeData,
batching/loading helpers (counterpart of ``torchvision/datasets``)."""

from .cifar import CIFAR10, CIFAR100  # noqa: F401
from .coco import CocoCaptions, CocoDetection  # noqa: F401
from .extra import STL10, SVHN, ImageNet  # noqa: F401
from .extra2 import CelebA, FER2013, LFWPeople, Omniglot  # noqa: F401
from .simple import (  # noqa: F401
    DTD,
    Caltech101,
    Caltech256,
    Country211,
    EuroSAT,
    Flowers102,
    Food101,
    GTSRB,
    OxfordIIITPet,
)
from .video_utils import RandomClipSampler, UniformClipSampler, VideoClips  # noqa: F401
from .voc import VOC_CLASSES, VOCDetection, VOCSegmentation  # noqa: F401
from .fakedata import FakeData  # noqa: F401
from .folder import DatasetFolder, ImageFolder  # noqa: F401
from .loader import DataLoader, DistributedSampler  # noqa: F401
from .mnist import KMNIST, MNIST, FashionMNIST  # noqa: F401
from .utils import (  # noqa: F401
    check_integrity,
    download_and_extract_archive,
    download_url,
    extract_archive,
)
from .vision import StandardTransform, VisionDataset  # noqa: F401
