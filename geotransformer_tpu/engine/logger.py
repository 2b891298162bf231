r"""Console + file logger (reference: engine/logger.py:6-53).

Process-0-only by default, mirroring the reference's rank gating; in JAX the
rank is `jax.process_index()`.
"""

import logging
import sys


def create_logger(log_file=None, name="geotransformer_tpu", process_index=0):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    logger.handlers.clear()

    if process_index == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setLevel(logging.DEBUG)
        console.setFormatter(logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s"))
        logger.addHandler(console)
        if log_file is not None:
            file_handler = logging.FileHandler(log_file)
            file_handler.setLevel(logging.DEBUG)
            file_handler.setFormatter(
                logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s")
            )
            logger.addHandler(file_handler)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
