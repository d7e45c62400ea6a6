"""End-to-end pipelines composed from filda_ray.ops."""
