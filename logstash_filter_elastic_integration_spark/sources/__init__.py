from .datagen import transcripts, role_dim, tool_dim  # noqa: F401
from .catalog import Catalog  # noqa: F401
from .checkpoint import CheckpointManifest  # noqa: F401
