"""Run logging: event tracker + console/file loggers
(ref: /root/reference/sayn/logging/)."""

from sayn_spark.logs.events import EventTracker, TaskEventTracker
from sayn_spark.logs.loggers import (
    CollectingLogger,
    ConsoleLogger,
    FileLogger,
    Logger,
)

__all__ = [
    "EventTracker",
    "TaskEventTracker",
    "Logger",
    "ConsoleLogger",
    "FileLogger",
    "CollectingLogger",
]
