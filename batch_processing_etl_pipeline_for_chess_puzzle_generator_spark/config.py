"""Config-driven pipeline setup (reference parity: config/etl_config.yml
drives master/executor settings and data paths — reference:
etl/transform.py:76-86 reads the same shape).

The YAML schema is a superset of the reference's:

```yaml
pyspark:
  master: "local[*]"          # or yarn / k8s://... / spark://...
  executor_memory: "4g"
  num_executors: 4
  conf:                       # free-form spark conf overrides
    spark.sql.shuffle.partitions: 64
data:
  raw_data_path: "data/raw/"
  transformed_data_path: "data/transformed/"
```

Unknown keys are preserved in ``PipelineConfig.extra`` so deployments
can thread their own settings through one file.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.session import get_spark


@dataclass
class PipelineConfig:
    master: str | None = None
    executor_memory: str | None = None
    num_executors: int | None = None
    conf: dict[str, Any] = field(default_factory=dict)
    raw_data_path: str = "data/raw/"
    transformed_data_path: str = "data/transformed/"
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        import yaml

        with open(path) as fh:
            raw = yaml.safe_load(fh) or {}
        ps = raw.get("pyspark", {}) or {}
        data = raw.get("data", {}) or {}
        known = {"pyspark", "data"}
        return cls(
            master=ps.get("master"),
            executor_memory=ps.get("executor_memory"),
            num_executors=ps.get("num_executors"),
            conf=dict(ps.get("conf", {}) or {}),
            raw_data_path=data.get("raw_data_path", "data/raw/"),
            transformed_data_path=data.get("transformed_data_path", "data/transformed/"),
            extra={k: v for k, v in raw.items() if k not in known},
        )

    def build_session(self, app_name: str = "batch-processing-etl-pipeline-for-chess-puzzle-generator-spark") -> SparkSession:
        """Session from config: the tuned factory defaults, overridden
        by anything set here (config wins over factory defaults)."""
        spark = get_spark(app_name, master=self.master)
        for k, v in self.conf.items():
            spark.conf.set(k, str(v))
        return spark
