from .logging import Logs, print_progress
