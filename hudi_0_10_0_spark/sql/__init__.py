from .extension import install_sql_extension, uninstall_sql_extension
from .parser import HudiSqlSession

__all__ = ["HudiSqlSession", "install_sql_extension", "uninstall_sql_extension"]
