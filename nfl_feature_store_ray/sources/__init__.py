from nfl_feature_store_ray.sources.readers import read_table
from nfl_feature_store_ray.sources.transcripts import (
    generate_transcripts,
    transcripts_from_events,
)

__all__ = ["read_table", "transcripts_from_events", "generate_transcripts"]
