/* Batched UDP receive via recvmmsg (the receive-side twin of udp_tx.c).
 *
 * Role analogue of the reference's dedicated UDP reader thread + queue
 * (net_udp.c:163-187 udp_reader, net_udp.c:1129-1131 recvmmsg batching):
 * one syscall drains up to `max_pkts` datagrams into a caller-provided
 * contiguous buffer; per-packet offsets/lengths are returned for zero-copy
 * parsing on the Python side.  Original implementation.
 */

#define _GNU_SOURCE
#include <errno.h>
#include <stdint.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <poll.h>

#define MAX_BATCH 256

/* Receive up to max_pkts datagrams (each at most slot_size bytes) into buf.
 * Returns the number received (0 on timeout), -1 on error.
 * lens[i] receives each datagram's length. timeout_us < 0 blocks. */
long udp_recv_batch(int fd, unsigned char *buf, long slot_size, int max_pkts,
                    int *lens, long timeout_us)
{
    if (max_pkts > MAX_BATCH)
        max_pkts = MAX_BATCH;

    struct pollfd pfd = { .fd = fd, .events = POLLIN };
    int ptimeout = timeout_us < 0 ? -1 : (int)(timeout_us / 1000);
    if (timeout_us >= 0 && ptimeout == 0 && timeout_us > 0)
        ptimeout = 1;
    int pr = poll(&pfd, 1, ptimeout);
    if (pr <= 0)
        return pr < 0 ? -1 : 0;

    struct mmsghdr msgs[MAX_BATCH];
    struct iovec iovs[MAX_BATCH];
    memset(msgs, 0, sizeof(struct mmsghdr) * (size_t)max_pkts);
    for (int i = 0; i < max_pkts; i++) {
        iovs[i].iov_base = buf + (long)i * slot_size;
        iovs[i].iov_len = (size_t)slot_size;
        msgs[i].msg_hdr.msg_iov = &iovs[i];
        msgs[i].msg_hdr.msg_iovlen = 1;
    }
    /* NULL timeout: recvmmsg checks the timeout AFTER each datagram, so a
     * zero timespec would return after the FIRST one (measured).  DONTWAIT
     * alone gives "drain whatever is queued, up to max_pkts, never block". */
    int n = recvmmsg(fd, msgs, (unsigned)max_pkts, MSG_DONTWAIT, NULL);
    if (n < 0)
        return (errno == EAGAIN || errno == EWOULDBLOCK) ? 0 : -1;
    for (int i = 0; i < n; i++)
        lens[i] = (int)msgs[i].msg_len;
    return n;
}
