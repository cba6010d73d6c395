"""Parity-critical constants shared by the ENGINE and the SERIAL
ORACLE. One definition: the two sides exact-match each other on
crawl_order/seen/entities, so a value drifting in only one of them
would surface as a parity break with no import error pointing at the
cause."""

# statuses that count as a successful fetch (render.js:24-32 keeps
# partial content on timeout)
OK_STATUSES = ("ok", "partial")
