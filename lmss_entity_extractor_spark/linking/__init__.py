from .scorer import Linker, LinkerConfig  # noqa: F401
