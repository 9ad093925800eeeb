from .mq import MQDataSource

__all__ = ["MQDataSource"]
