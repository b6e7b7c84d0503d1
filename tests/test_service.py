"""Service-function suite — models the reference's
``tests/test_service.py`` over the drop-in ``mkl_*`` aliases and the
canonical names."""

import unittest

import numpy as np

from sparse_dot_tpu import (
    mkl_get_version,
    mkl_get_version_string,
    mkl_get_max_threads,
    mkl_set_interface_layer,
    mkl_set_num_threads,
    mkl_set_num_threads_local,
    mkl_interface_integer_dtype,
    get_version,
    get_device_count,
    set_debug_mode,
)


class TestServiceFunctions(unittest.TestCase):
    def test_version(self):
        version_info = mkl_get_version()
        self.assertTrue(isinstance(version_info[0], int))
        self.assertTrue(isinstance(version_info[1], int))
        self.assertTrue(isinstance(version_info[2], int))
        self.assertTrue(isinstance(version_info[3], str))
        self.assertTrue(isinstance(version_info[4], str))
        self.assertTrue(isinstance(version_info[5], str))
        self.assertTrue(isinstance(version_info[6], str))

    def test_version_str(self):
        self.assertTrue(isinstance(mkl_get_version_string(), str))

    def test_version_dict(self):
        v = get_version()
        self.assertIn("platform", v)
        self.assertIn("num_devices", v)

    def test_get_threads(self):
        self.assertTrue(isinstance(mkl_get_max_threads(), int))

    def test_set_threads(self):
        n_threads_before = mkl_set_num_threads_local(1)
        mkl_set_num_threads(1)
        self.assertEqual(mkl_get_max_threads(), 1)
        mkl_set_num_threads_local(n_threads_before)

    def test_set_interface_layer(self):
        mkl_set_interface_layer(0)
        self.assertEqual(mkl_interface_integer_dtype(), np.int32)
        mkl_set_interface_layer(1)
        self.assertEqual(mkl_interface_integer_dtype(), np.int64)
        mkl_set_interface_layer("LP64")
        with self.assertRaises(ValueError):
            mkl_set_interface_layer("MKL")

    def test_get_integer_interface(self):
        self.assertIn(mkl_interface_integer_dtype(), [np.int32, np.int64])

    def test_device_count(self):
        self.assertGreaterEqual(get_device_count(), 1)

    def test_debug_mode(self):
        set_debug_mode(True)
        set_debug_mode(False)
        with self.assertRaises(ValueError):
            set_debug_mode("yes")


if __name__ == "__main__":
    unittest.main()
