"""Training utilities: metrics, checkpointing, eval presets (counterpart of
the reference's ``references/classification/utils.py`` helpers and
``transforms/_presets.py``)."""

from .checkpoint import load_checkpoint, load_params, save_checkpoint  # noqa: F401
from .metrics import MetricLogger, SmoothedValue, accuracy  # noqa: F401
from .presets import (  # noqa: F401
    ImageClassificationEval,
    ImageClassificationTrain,
    ObjectDetectionEval,
    SemanticSegmentationEval,
    VideoClassificationEval,
)
from .ema import ExponentialMovingAverage  # noqa: F401
