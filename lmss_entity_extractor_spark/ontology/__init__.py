from .owl import parse_owl_classes  # noqa: F401
from .artifacts import OntologyArtifacts, build_artifacts  # noqa: F401
