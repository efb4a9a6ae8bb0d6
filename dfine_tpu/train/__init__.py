from .criterion import CriterionConfig, criterion_forward  # noqa: F401
