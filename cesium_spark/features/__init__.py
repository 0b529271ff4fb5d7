from .registry import (  # noqa: F401
    ALL_FEATS,
    CADENCE_FEATS,
    GENERAL_FEATS,
    LOMB_SCARGLE_FEATS,
    FEATURE_GRAPH,
    compute_features,
)
