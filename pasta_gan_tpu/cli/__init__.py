"""CLI entry points: train, test, test_512, calc_metrics, dataset_tool."""
