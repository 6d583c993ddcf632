"""Window-shell analog (L6): a local web shell over EmSpecApp.

See emspec.shell.server — ``python -m emspec gui`` serves the live
display + the full settings panel at http://127.0.0.1:<port>/.
"""

from emspec.shell.server import ShellServer

__all__ = ["ShellServer"]
