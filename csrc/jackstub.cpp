// Deterministic stub libjack for driving the native JACK bridge in CI.
//
// TEST FIXTURE ONLY — this environment has no jackd, so tests point the
// bridge at this library via TPU_AUDIO_LIBJACK (csrc/jackbridge.cpp
// load_jack) and the whole binary runs end-to-end: a fake RT thread calls
// the registered process callback at a fixed pace with a known capture
// pattern, records what the bridge writes to the playback ports, and logs
// jack_connect calls. Configuration via environment:
//
//   JACK_STUB_BLOCK          frames/period (default 256)
//   JACK_STUB_RATE           sample rate (default 44100)
//   JACK_STUB_PERIODS        callback invocations before stopping (default 8)
//   JACK_STUB_PERIOD_US      pacing between callbacks (default 2000)
//   JACK_STUB_CONNECT_LOG    file to append "src -> dst" lines to
//   JACK_STUB_DUMP           file to append playback f32 (planar L,R) per
//                            period
//   JACK_STUB_ASSIGNED_NAME  report a server-renamed client name
//   JACK_STUB_RAISE_ON_DONE  raise(SIGTERM) after the last period so a
//                            --max-seconds bridge exits promptly
//
// Capture pattern (asserted by tests/test_native.py): during period p,
// in_0 is all 0.25+p and in_1 is all -0.5-p (exact in f32).

#include <atomic>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <unistd.h>

extern "C" {

typedef uint32_t jack_nframes_t;
typedef int (*JackProcessCallback)(jack_nframes_t, void*);

struct stub_port {
    char name[128];
    unsigned long flags;  // 0x1 input, 0x2 output
    float* buffer;
};

struct stub_client {
    char name[128];
    jack_nframes_t block;
    uint32_t rate;
    JackProcessCallback cb;
    void* cb_arg;
    stub_port* ports[16];
    int n_ports;
    pthread_t thread;
    std::atomic<int> running;
    int thread_started;
};

static long env_long(const char* key, long dflt) {
    const char* v = getenv(key);
    return (v && v[0]) ? atol(v) : dflt;
}

void* jack_client_open(const char* name, int /*options*/, void* /*status*/) {
    stub_client* c = (stub_client*)calloc(1, sizeof(stub_client));
    const char* assigned = getenv("JACK_STUB_ASSIGNED_NAME");
    snprintf(c->name, sizeof(c->name), "%s",
             (assigned && assigned[0]) ? assigned : name);
    c->block = (jack_nframes_t)env_long("JACK_STUB_BLOCK", 256);
    c->rate = (uint32_t)env_long("JACK_STUB_RATE", 44100);
    return c;
}

char* jack_get_client_name(void* client) {
    return ((stub_client*)client)->name;
}

uint32_t jack_get_sample_rate(void* client) {
    return ((stub_client*)client)->rate;
}

jack_nframes_t jack_get_buffer_size(void* client) {
    return ((stub_client*)client)->block;
}

void* jack_port_register(void* client, const char* name, const char* /*type*/,
                         unsigned long flags, unsigned long /*bufsize*/) {
    stub_client* c = (stub_client*)client;
    if (c->n_ports >= 16) return nullptr;
    stub_port* p = (stub_port*)calloc(1, sizeof(stub_port));
    snprintf(p->name, sizeof(p->name), "%s:%s", c->name, name);
    p->flags = flags;
    p->buffer = (float*)calloc(c->block, sizeof(float));
    c->ports[c->n_ports++] = p;
    return p;
}

void* jack_port_get_buffer(void* port, jack_nframes_t /*nframes*/) {
    return ((stub_port*)port)->buffer;
}

int jack_set_process_callback(void* client, JackProcessCallback cb,
                              void* arg) {
    stub_client* c = (stub_client*)client;
    c->cb = cb;
    c->cb_arg = arg;
    return 0;
}

static void* stub_thread(void* arg) {
    stub_client* c = (stub_client*)arg;
    long periods = env_long("JACK_STUB_PERIODS", 8);
    long pace_us = env_long("JACK_STUB_PERIOD_US", 2000);
    const char* dump_path = getenv("JACK_STUB_DUMP");
    FILE* dump = (dump_path && dump_path[0]) ? fopen(dump_path, "ab")
                                             : nullptr;
    for (long p = 0; p < periods && c->running.load(); p++) {
        // deterministic capture pattern, exact in f32 for small p; ports
        // register interleaved (in_0, out_0, in_1, out_1) — the flags tell
        // them apart, registration order within a kind is stable
        int in_seen = 0;
        for (int i = 0; i < c->n_ports; i++) {
            stub_port* port = c->ports[i];
            if (port->flags & 0x1) {  // bridge input port: we supply capture
                float v = in_seen == 0 ? 0.25f + (float)p : -0.5f - (float)p;
                for (jack_nframes_t k = 0; k < c->block; k++)
                    port->buffer[k] = v;
                in_seen++;
            }
        }
        if (c->cb) c->cb(c->block, c->cb_arg);
        if (dump) {
            for (int i = 0; i < c->n_ports; i++) {
                stub_port* port = c->ports[i];
                if (port->flags & 0x2)  // bridge output port: playback
                    fwrite(port->buffer, sizeof(float), c->block, dump);
            }
            fflush(dump);
        }
        usleep((useconds_t)pace_us);
    }
    if (dump) fclose(dump);
    if (env_long("JACK_STUB_RAISE_ON_DONE", 0)) raise(SIGTERM);
    return nullptr;
}

int jack_activate(void* client) {
    stub_client* c = (stub_client*)client;
    c->running.store(1);
    if (pthread_create(&c->thread, nullptr, stub_thread, c) != 0) return 1;
    c->thread_started = 1;
    return 0;
}

int jack_deactivate(void* client) {
    stub_client* c = (stub_client*)client;
    c->running.store(0);
    if (c->thread_started) {
        pthread_join(c->thread, nullptr);
        c->thread_started = 0;
    }
    return 0;
}

int jack_client_close(void* client) {
    stub_client* c = (stub_client*)client;
    jack_deactivate(client);
    for (int i = 0; i < c->n_ports; i++) {
        free(c->ports[i]->buffer);
        free(c->ports[i]);
    }
    free(c);
    return 0;
}

int jack_connect(void* /*client*/, const char* src, const char* dst) {
    const char* path = getenv("JACK_STUB_CONNECT_LOG");
    if (path && path[0]) {
        FILE* f = fopen(path, "a");
        if (f) {
            fprintf(f, "%s -> %s\n", src, dst);
            fclose(f);
        }
    }
    return 0;
}

}  // extern "C"
