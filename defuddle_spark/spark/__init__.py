"""Spark job layer: session config, page synthesis, extraction pipeline,
manifests/resume. All plan-level structure is native DataFrame code;
per-document semantics live in the kernel (defuddle_spark.kernel)."""
