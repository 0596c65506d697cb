/* Native proxy TCP receiver.
 *
 * Fresh implementation of the contract of the reference's proxy source
 * (reference: src/cwipc_proxy.cpp:158-336): bind/listen, accept one
 * connection, read 24-byte packet headers (magic 0x20201016) + point
 * payload, build a cloud, hand it over latest-wins under a mutex+condvar,
 * echo the timestamp as an ack, and re-accept after disconnect. */

#include "cwipc_capi.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "cwipc_source_impl.hpp"

namespace {

class ProxySource : public cwipc_source {
  public:
    ProxySource(const char *host, int port, char **errorMessage) {
        listen_fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
        if (listen_fd_ < 0) {
            if (errorMessage) *errorMessage = strdup("cwipc_proxy: cannot create socket");
            ok_ = false;
            return;
        }
        int reuse = 1;
        setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
        sockaddr_in addr{};
        addr.sin_family = AF_INET;
        addr.sin_port = htons((uint16_t)port);
        addr.sin_addr.s_addr = (host && *host) ? inet_addr(host) : INADDR_ANY;
        if (bind(listen_fd_, (sockaddr *)&addr, sizeof(addr)) < 0 ||
            listen(listen_fd_, 1) < 0) {
            if (errorMessage) *errorMessage = strdup("cwipc_proxy: cannot bind/listen");
            ::close(listen_fd_);
            listen_fd_ = -1;
            ok_ = false;
            return;
        }
        thread_ = std::thread(&ProxySource::serverMain, this);
    }

    ~ProxySource() override { stop(); }

    bool valid() const { return ok_; }

    bool start() override { return ok_; }

    void stop() override {
        running_ = false;
        if (listen_fd_ >= 0) {
            ::shutdown(listen_fd_, SHUT_RDWR);
            ::close(listen_fd_);
            listen_fd_ = -1;
        }
        /* also shut down the accepted connection: a connected-but-silent
         * sender would keep serverMain blocked in recv() and the join
         * below would hang forever */
        int conn = conn_fd_.load();
        if (conn >= 0) ::shutdown(conn, SHUT_RDWR);
        cv_.notify_all();
        if (thread_.joinable()) thread_.join();
        std::lock_guard<std::mutex> lock(mutex_);
        if (pending_) {
            cwipc_pointcloud_free(pending_);
            pending_ = nullptr;
        }
    }

    bool eof() override { return !running_; }

    bool available(bool wait) override {
        std::unique_lock<std::mutex> lock(mutex_);
        if (pending_) return true;
        if (!wait || !running_) return false;
        cv_.wait_for(lock, std::chrono::seconds(2));
        return pending_ != nullptr;
    }

    cwipc_pointcloud *get() override {
        std::unique_lock<std::mutex> lock(mutex_);
        while (!pending_ && running_) {
            cv_.wait_for(lock, std::chrono::milliseconds(500));
        }
        cwipc_pointcloud *rv = pending_;
        pending_ = nullptr;
        return rv;
    }

  private:
    bool recvAll(int fd, void *buf, size_t n) {
        uint8_t *p = (uint8_t *)buf;
        while (n > 0) {
            ssize_t got = ::recv(fd, p, n, 0);
            if (got <= 0) return false;
            p += got;
            n -= (size_t)got;
        }
        return true;
    }

    void serverMain() {
        while (running_) {
            int conn = ::accept(listen_fd_, nullptr, nullptr);
            if (conn < 0) {
                if (!running_) break;
                continue;
            }
            conn_fd_ = conn;
            while (running_) {
                struct cwipc_point_packetheader hdr;
                if (!recvAll(conn, &hdr, sizeof(hdr))) break;
                if (hdr.magic != CWIPC_POINT_PACKETHEADER_MAGIC) break;
                if (hdr.dataCount % sizeof(cwipc_point) != 0) break;
                std::vector<uint8_t> payload(hdr.dataCount);
                if (!recvAll(conn, payload.data(), payload.size())) break;
                cwipc_pointcloud *pc = cwipc_from_points(
                    (struct cwipc_point *)payload.data(), payload.size(),
                    (int)(payload.size() / sizeof(cwipc_point)), hdr.timestamp,
                    nullptr, CWIPC_API_VERSION);
                if (pc) {
                    cwipc_pointcloud__set_cellsize(pc, hdr.cellsize);
                    std::lock_guard<std::mutex> lock(mutex_);
                    /* latest-wins: replace an unconsumed cloud */
                    if (pending_) cwipc_pointcloud_free(pending_);
                    pending_ = pc;
                    cv_.notify_all();
                }
                uint64_t ack = hdr.timestamp;
                /* MSG_NOSIGNAL: a sender that disconnected before the ack
                 * must produce EPIPE, not a process-killing SIGPIPE */
                ::send(conn, &ack, sizeof(ack), MSG_NOSIGNAL);
            }
            conn_fd_ = -1;
            ::close(conn);
        }
    }

    int listen_fd_ = -1;
    std::atomic<int> conn_fd_{-1};
    bool ok_ = true;
    std::atomic<bool> running_{true};
    std::thread thread_;
    std::mutex mutex_;
    std::condition_variable cv_;
    cwipc_pointcloud *pending_ = nullptr;
};

}  // namespace

extern "C" cwipc_source *cwipc_proxy(const char *host, int port,
                                     char **errorMessage, uint64_t apiVersion) {
    if (apiVersion < CWIPC_API_VERSION_OLD || apiVersion > CWIPC_API_VERSION) {
        if (errorMessage) *errorMessage = strdup("cwipc_proxy: incorrect apiVersion");
        return nullptr;
    }
    auto *src = new ProxySource(host, port, errorMessage);
    if (!src->valid()) {
        delete src;
        return nullptr;
    }
    return src;
}
