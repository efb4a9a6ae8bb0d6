from .dataset import DetectionDataset, Sample  # noqa: F401
from .loader import Loader  # noqa: F401
