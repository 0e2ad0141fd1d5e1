"""The weights-table data model + J1 parameter-copy join (SURVEY §2.5).

The reference stores model parameters in named ComputationGraph layers and
syncs them between graphs with hard-coded name maps, e.g.
"dis_conv2d_layer_2" → "gan_dis_conv2d_layer_10"
(dl4jGANComputerVision.java:429-460 dis→gan, :474-510 gan→gen, :516-542
dis→cv). Engine model: a long-form DataFrame ``(layer, param, pos, value)``
(plus a vector short-form ``(layer, param, vec)``), and the copy is a
broadcast hash equi-join — the weights side is always tiny relative to data,
so Catalyst broadcasts it for free under the autoBroadcast threshold.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_KEYS = ["layer", "param", "pos"]


def copy_weights(
    dst: DataFrame, src: DataFrame, layer_map: dict[str, str]
) -> DataFrame:
    """J1: overwrite dst values with src values under a layer-name mapping.

    dst/src schema: (layer string, param string, pos int, value double).
    ``layer_map`` maps src layer name → dst layer name (a literal lookup,
    exactly the reference's hard-coded name tables).
    """
    mapping = F.create_map(
        *list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in layer_map.items()))
    )
    src_mapped = src.select(
        mapping[F.col("layer")].alias("layer"),
        "param",
        "pos",
        F.col("value").alias("__src_value"),
    ).filter(F.col("layer").isNotNull())
    joined = dst.join(F.broadcast(src_mapped), WEIGHT_KEYS, "left")
    return joined.select(
        *WEIGHT_KEYS,
        F.coalesce(F.col("__src_value"), F.col("value")).alias("value"),
    )


def vectors_to_long(df: DataFrame, layer: str = "layer", param: str = "param",
                    vec: str = "vec") -> DataFrame:
    """Short-form (layer, param, vec: array<double>) → long form."""
    return df.select(
        layer, param, F.posexplode(F.col(vec).cast("array<double>")).alias("pos", "value")
    )


def long_to_vectors(df: DataFrame) -> DataFrame:
    """Long form → short form, order restored by pos (never rely on row
    order after a shuffle)."""
    return (
        df.groupBy("layer", "param")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "value"))).alias("pv"))
        .select(
            "layer",
            "param",
            F.transform(F.col("pv"), lambda s: s["value"]).alias("vec"),
        )
    )
