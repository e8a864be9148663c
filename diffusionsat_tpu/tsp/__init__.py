PADDING_VALUE = -1.0  # reference metrics/tsp_metrics.py PADDING_VALUE
