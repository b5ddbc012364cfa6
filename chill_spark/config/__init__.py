from .model import FieldSpec, JobSpec

__all__ = ["FieldSpec", "JobSpec"]
