"""The public API surface imports cleanly and exposes what __all__
promises — catches broken exports before a consumer does."""

import importlib

MODULES = [
    "sportstv_streaming_data_warehouse_spark",
    "sportstv_streaming_data_warehouse_spark.session",
    "sportstv_streaming_data_warehouse_spark.model",
    "sportstv_streaming_data_warehouse_spark.sources",
    "sportstv_streaming_data_warehouse_spark.functions",
    "sportstv_streaming_data_warehouse_spark.functions.text",
    "sportstv_streaming_data_warehouse_spark.operators",
    "sportstv_streaming_data_warehouse_spark.operators.multimodal",
    "sportstv_streaming_data_warehouse_spark.operators.packing",
    "sportstv_streaming_data_warehouse_spark.operators.bloom",
    "sportstv_streaming_data_warehouse_spark.operators.bpe",
    "sportstv_streaming_data_warehouse_spark.plans",
    "sportstv_streaming_data_warehouse_spark.streaming.ingest",
    "sportstv_streaming_data_warehouse_spark.streaming.sessionize",
    "sportstv_streaming_data_warehouse_spark.streaming.near_dup",
]


def test_all_modules_import_and_export():
    for name in MODULES:
        mod = importlib.import_module(name)
        for sym in getattr(mod, "__all__", []):
            assert hasattr(mod, sym), f"{name}.{sym} missing"


def test_entry_module_contract():
    import __spark_entry__ as e

    assert callable(e.entry) and callable(e.queries) and callable(e.oracle_sql)
