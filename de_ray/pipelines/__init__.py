"""End-to-end pipelines: the flagship webtext → knowledge-graph build."""

from de_ray.pipelines.kg import run_kg_pipeline  # noqa: F401
