from .notifier import CollectingNotifier, LoggingNotifier, Notifier
from .scheduler import CronSchedule, JobRunner, describe_cron

__all__ = [
    "Notifier",
    "LoggingNotifier",
    "CollectingNotifier",
    "CronSchedule",
    "JobRunner",
    "describe_cron",
]
