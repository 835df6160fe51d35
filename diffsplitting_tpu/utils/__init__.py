from .experiment import get_workdir, get_model_name, get_new_model_version
from .logging_utils import setup_logger, mkdirs, get_timestamp
