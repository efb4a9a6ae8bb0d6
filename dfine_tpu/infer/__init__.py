from .jax_model import JAXModel, Int8Model  # noqa: F401
from .aot_model import AOTModel  # noqa: F401
from .exported_model import ExportedModel  # noqa: F401
