from .batcher import (
    BatcherClosedError,
    DynamicBatcher,
    QueueFullError,
)
from .http import make_http_server
from .service import DetectionService
