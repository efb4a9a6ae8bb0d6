from .validator import Validator  # noqa: F401
