from .bijectors import (
    AffineT,
    BatchNormFlow,
    Chain,
    ConditionalAffineT,
    ExpT,
    SigmoidT,
    SplineT,
)
from .distributions import (
    Categorical,
    FlowDist,
    Gumbel,
    Normal,
    Uniform,
)
