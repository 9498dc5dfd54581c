from .baselines import PixelBaselineExplainers
from .engine import CounterfactualEngine
from .finetune import EncoderFinetuner, FinetuneConfig
