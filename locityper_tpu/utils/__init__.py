from .logging import get_logger, setup_logging  # noqa: F401
from .io import (  # noqa: F401
    smart_open, smart_create, atomic_write, file_sha,
    write_success, has_success, Rerun,
)
