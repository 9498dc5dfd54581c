from .module import (
    CategoricalCM,
    ConditionalCategoricalCM,
    FlowCM,
)
from .graph import CausalGraph
