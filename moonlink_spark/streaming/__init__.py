from moonlink_spark.streaming.stream import apply_cdc_stream, cdc_file_stream

__all__ = ["apply_cdc_stream", "cdc_file_stream"]
