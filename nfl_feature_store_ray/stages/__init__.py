from nfl_feature_store_ray.stages.bucketize import map_conv_buckets, with_bucket
from nfl_feature_store_ray.stages.derive import derive_turn_columns
from nfl_feature_store_ray.stages.fill import fill_zero_except

__all__ = [
    "derive_turn_columns",
    "with_bucket",
    "map_conv_buckets",
    "fill_zero_except",
]
