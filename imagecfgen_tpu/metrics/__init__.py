from .scores import (
    cf_effectiveness_score,
    generator_score,
    resample_excluding,
)
