"""Dataset → Dataset stage implementations (map_batches bodies, actor classes,
groupby compositions).  Each stage is a function or callable class usable with
``ray.data.Dataset.map_batches`` — no stage owns a Ray session."""
