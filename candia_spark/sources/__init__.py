"""Source/sink adapters (SURVEY.md §2.1): mzML ingestion, mzXML/MGF/FASTA
export, typed report readers. Heavy row volume goes through Spark; the
single-file ordered sinks run driver-side over ``toLocalIterator()``."""
