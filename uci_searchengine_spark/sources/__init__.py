from uci_searchengine_spark.sources.synth import synth_pages, synth_pages_local  # noqa: F401
