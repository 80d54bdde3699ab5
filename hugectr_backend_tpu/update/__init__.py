from hugectr_backend_tpu.update.source import (
    FileQueueSource,
    MessageProducer,
    MessageSource,
    UpdateConsumer,
    make_update_source,
)

__all__ = [
    "FileQueueSource",
    "MessageProducer",
    "MessageSource",
    "UpdateConsumer",
    "make_update_source",
]
