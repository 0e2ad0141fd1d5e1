"""Column-expression library — the engine's scalar/vector function surface.

These are the Spark-native re-expressions of the reference's element-wise
transforms (SURVEY §2.2), activations (§2.8 K6), and random generators (§2.3).
Everything here is a pure Catalyst expression (whole-stage-codegen eligible);
no Python UDFs.
"""

from .elementwise import (  # noqa: F401
    affine_rescale,
    clip,
    label_smooth,
    minmax_normalize_expr,
    sigmoid,
    softmax_arr,
    tanh_arr,
)
from .vector import (  # noqa: F401
    argmax_index,
    cosine_similarity,
    dot,
    l2_norm,
    vec_scale,
)
from .random import seeded_rand, seeded_randn, latent_grid  # noqa: F401
