from pyspark_pipelining_spark.plans.dag import Pipeline, PipelineConfig, Stage

__all__ = ["Pipeline", "PipelineConfig", "Stage"]
