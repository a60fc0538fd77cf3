from .ontology_fixture import FIXTURE_CLASSES, write_fixture_owl  # noqa: F401
from .transcripts import gen_transcript_rows, write_transcripts_parquet  # noqa: F401
