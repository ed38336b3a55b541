from .pipeline import Pipeline, Stage
from .quality import expect_nonempty, expect_unique_key, violation_count

__all__ = ["Pipeline", "Stage", "expect_nonempty", "expect_unique_key", "violation_count"]
