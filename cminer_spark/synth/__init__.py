from cminer_spark.synth.transcripts import synth_transcripts

__all__ = ["synth_transcripts"]
