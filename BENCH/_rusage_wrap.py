"""Exec a command, then report its total child CPU (user+sys) on stderr —
a /usr/bin/time -v stand-in for containers without GNU time."""

import resource
import subprocess
import sys

rc = subprocess.call(sys.argv[1:])
ru = resource.getrusage(resource.RUSAGE_CHILDREN)
print(
    f"RUSAGE_CPU_S {ru.ru_utime + ru.ru_stime:.1f} user {ru.ru_utime:.1f} "
    f"sys {ru.ru_stime:.1f} majflt {ru.ru_majflt} nvcsw {ru.ru_nvcsw} nivcsw {ru.ru_nivcsw}",
    file=sys.stderr,
)
sys.exit(rc)
