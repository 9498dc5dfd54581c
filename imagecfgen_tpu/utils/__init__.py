from .profiling import StepTimer, trace
from .logging import MetricsLogger
