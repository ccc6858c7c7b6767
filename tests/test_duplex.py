"""Full-duplex session mode: -t ... -d ... <peer> sends and receives at once.

Self-call loopback: the process sends its own testcard stream to
127.0.0.1:<rx_port>, where its own receiver chain displays it — both chains
live in one process sharing the module tree and control socket, like the
reference's capture + receiver threads (ref: main.cpp:347-397, rxtx.cpp:153).
"""

from __future__ import annotations

import ultragrid_tpu.cli as cli


def test_duplex_self_call(capfd):
    rc = cli.main([
        "-t", "testcard:s=64x48", "-d", "dummy", "127.0.0.1",
        "-P", "10704", "--control-port", "0", "--frames", "8", "-c", "none",
    ])
    assert rc == 0
    err = capfd.readouterr().err
    assert "sent 8 frames" in err
    # the receiver shares the process; at least most frames must display
    import re

    m = re.search(r"displayed (\d+) frames", err)
    assert m, err
    assert int(m.group(1)) >= 4


def test_duplex_jpeg_with_fec(capfd):
    rc = cli.main([
        "-t", "testcard:s=128x96", "-d", "dummy", "127.0.0.1",
        "-P", "10714", "--control-port", "0", "--frames", "6",
        "-c", "jpeg", "-f", "ldgm:32:6:3",
    ])
    assert rc == 0
    err = capfd.readouterr().err
    assert "sent 6 frames" in err
    import re

    m = re.search(r"displayed (\d+) frames", err)
    assert m and int(m.group(1)) >= 3, err
