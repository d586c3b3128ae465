"""Datasets: base classes, folder trees, MNIST/CIFAR families, FakeData,
batching/loading helpers (counterpart of ``torchvision/datasets``)."""

from .cifar import CIFAR10, CIFAR100  # noqa: F401
from .coco import CocoCaptions, CocoDetection  # noqa: F401
from .classification import STL10, SVHN, ImageNet  # noqa: F401
from .faces import CelebA, FER2013, LFWPeople, Omniglot  # noqa: F401
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
from .fine_grained import (  # noqa: F401
    PCAM,
    SEMEION,
    SUN397,
    USPS,
    CLEVRClassification,
    FGVCAircraft,
    Imagenette,
    INaturalist,
    Places365,
    RenderedSST2,
    StanfordCars,
)
from .detection_misc import (  # noqa: F401
    EMNIST,
    LSUN,
    QMNIST,
    SBU,
    Cityscapes,
    Flickr8k,
    Flickr30k,
    Kitti,
    LFWPairs,
    LSUNClass,
    PhotoTour,
    SBDataset,
    WIDERFace,
)
from .video import HMDB51, UCF101, FrameVideoClips, Kinetics  # noqa: F401
from .flow import HD1K, FlyingChairs, FlyingThings3D, KittiFlow, Sintel  # noqa: F401
from .stereo import (  # noqa: F401
    CarlaStereo,
    CREStereo,
    ETH3DStereo,
    FallingThingsStereo,
    InStereo2k,
    Kitti2012Stereo,
    Kitti2015Stereo,
    Middlebury2014Stereo,
    SceneFlowStereo,
    SintelStereo,
)
from .video_utils import RandomClipSampler, UniformClipSampler, VideoClips  # noqa: F401
from . import samplers  # noqa: F401
from .voc import VOC_CLASSES, VOCDetection, VOCSegmentation  # noqa: F401
from .fakedata import FakeData  # noqa: F401
from .synthetic import (  # noqa: F401
    SyntheticShapes,
    SyntheticShapesDetection,
    SyntheticShapesSegmentation,
    SyntheticShapesVideo,
)
from .folder import DatasetFolder, ImageFolder  # noqa: F401
from .loader import (  # noqa: F401
    BatchSampler,
    DataLoader,
    DistributedSampler,
    RandomSampler,
    Sampler,
    SequentialSampler,
    SubsetRandomSampler,
    WeightedRandomSampler,
    device_prefetch,
)
from .mnist import KMNIST, MNIST, FashionMNIST  # noqa: F401
from .utils import (  # noqa: F401
    check_integrity,
    download_and_extract_archive,
    download_url,
    extract_archive,
)
from .vision import StandardTransform, VisionDataset  # noqa: F401
from ._wrapper import wrap_dataset_for_transforms_v2  # noqa: F401
