"""Logging setup (counterpart of the reference's fern logger, main.rs:14-37)."""
import logging
import sys
import time

_FMT = "[%(asctime)s %(levelname)s %(name)s] %(message)s"


def setup_logging(level: int = logging.DEBUG) -> None:
    # Root stays at INFO so third-party (jax) debug spam is suppressed;
    # our own namespace runs at `level`.
    logging.basicConfig(level=logging.INFO, format=_FMT, datefmt="%H:%M:%S",
                        stream=sys.stderr)
    logging.getLogger("locityper").setLevel(level)
    logging.getLogger("jax").setLevel(logging.WARNING)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"locityper.{name}")


class Progress:
    """Throughput logger: prints items/s at most every `update_secs` seconds.

    Counterpart of Progress in reference seq/recruit.rs:130-233.
    """

    def __init__(self, logger, what: str = "reads", update_secs: float = 10.0,
                 show_recruited: bool = True):
        self.logger = logger
        self.what = what
        self.update_secs = update_secs
        self.show_recruited = show_recruited
        self.t0 = time.monotonic()
        self.last_msg = self.t0
        self.processed = 0
        self.recruited = 0

    def reset_clock(self) -> None:
        """Restarts the throughput clock (e.g. after a one-off kernel
        compile, so reported speeds reflect steady state)."""
        self.t0 = time.monotonic()
        self.last_msg = self.t0

    def add(self, processed: int, recruited: int = 0) -> None:
        self.processed += processed
        self.recruited += recruited
        now = time.monotonic()
        if now - self.last_msg >= self.update_secs:
            self._print(now)
            self.last_msg = now

    def _print(self, now: float) -> None:
        elapsed = max(now - self.t0, 1e-9)
        speed = 1e-3 * self.processed / elapsed
        if self.show_recruited:
            self.logger.debug(
                "    Recruited %d / %.0fk %s, %5.1fk %s/s",
                self.recruited, 1e-3 * self.processed, self.what, speed, self.what)
        else:
            self.logger.debug(
                "    Processed %.0fk %s, %5.1fk %s/s", 1e-3 * self.processed, self.what,
                speed, self.what)

    def final(self) -> float:
        """Prints the final message; returns items/s."""
        elapsed = max(time.monotonic() - self.t0, 1e-9)
        speed = self.processed / elapsed
        if self.show_recruited and self.processed:
            self.logger.debug(
                "    Recruited %d / %d %s (%.4f%%) in %.1f s (%5.1fk %s/s)",
                self.recruited, self.processed, self.what,
                100.0 * self.recruited / max(self.processed, 1), elapsed, 1e-3 * speed, self.what)
        else:
            self.logger.debug("    Processed %d %s in %.1f s (%5.1fk %s/s)",
                              self.processed, self.what, elapsed, 1e-3 * speed, self.what)
        return speed
