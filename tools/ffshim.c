/* Test-only FFmpeg shim: conformance oracle for the TPU-native codec.
 *
 * The framework itself never uses FFmpeg at runtime (the decode path is
 * native, see x264vfw_tpu/decode/); this shim exists so the test suite can
 * check the BASELINE.json requirement "bitstream output decodable by stock
 * FFmpeg at matched PSNR/SSIM" and to produce golden x264 streams for
 * decoder tests.
 *
 * Build: gcc -O2 -shared -fPIC tools/ffshim.c -o tools/libffshim.so \
 *            -lavcodec -lavutil
 */

#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <stdint.h>
#include <string.h>

/* Decode an Annex-B H.264 stream to packed I420 frames.
 * out buffer must hold max_frames * w*h*3/2 bytes (w,h from caller's
 * expectation; actual decoded dims returned; frames are written at the
 * actual size). Returns number of frames decoded, or negative error. */
int ffshim_decode_h264(const uint8_t *bs, int bs_size,
                       uint8_t *out, long out_cap,
                       int *out_w, int *out_h) {
    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->thread_count = 1;
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVCodecParserContext *parser = av_parser_init(AV_CODEC_ID_H264);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int n_frames = 0, ret = 0;
    long out_pos = 0;

    const uint8_t *data = bs;
    int remaining = bs_size;
    int eof_sent = 0;
    while (1) {
        if (!eof_sent) {
            uint8_t *pdata = NULL; int psize = 0;
            int was_flush_call = (remaining == 0);
            int used = av_parser_parse2(parser, ctx, &pdata, &psize,
                                        data, remaining, AV_NOPTS_VALUE,
                                        AV_NOPTS_VALUE, 0);
            if (used < 0) { ret = -4; break; }
            data += used; remaining -= used;
            if (psize > 0) {
                pkt->data = pdata; pkt->size = psize;
                if (avcodec_send_packet(ctx, pkt) < 0) { ret = -5; break; }
            } else if (was_flush_call) {
                /* size-0 flush call yielded nothing: parser fully drained */
                avcodec_send_packet(ctx, NULL);
                eof_sent = 1;
            } else {
                continue;
            }
        }
        while (1) {
            int r = avcodec_receive_frame(ctx, frame);
            if (r == AVERROR(EAGAIN)) break;
            if (r == AVERROR_EOF) { goto done; }
            if (r < 0) { ret = -6; goto done; }
            int w = frame->width, h = frame->height;
            *out_w = w; *out_h = h;
            long need = (long)w * h * 3 / 2;
            if (out_pos + need > out_cap) { ret = -7; goto done; }
            for (int i = 0; i < h; i++)
                memcpy(out + out_pos + (long)i * w, frame->data[0] + (long)i * frame->linesize[0], w);
            out_pos += (long)w * h;
            for (int p = 1; p <= 2; p++) {
                for (int i = 0; i < h / 2; i++)
                    memcpy(out + out_pos + (long)i * (w / 2),
                           frame->data[p] + (long)i * frame->linesize[p], w / 2);
                out_pos += (long)(w / 2) * (h / 2);
            }
            n_frames++;
        }
        if (eof_sent) break;
    }
done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    av_parser_close(parser);
    avcodec_free_context(&ctx);
    return ret < 0 ? ret : n_frames;
}

/* Encode I420 frames with libx264 (via libavcodec) -> Annex-B.
 * qp >= 0 uses constant QP; crf used otherwise. Returns bytes written or <0. */
long ffshim_encode_x264(const uint8_t *yuv, int n_frames, int w, int h,
                        int qp, float crf, const char *preset,
                        const char *x264opts,
                        uint8_t *out, long out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->width = w; ctx->height = h;
    ctx->time_base = (AVRational){1, 25};
    ctx->framerate = (AVRational){25, 1};
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->thread_count = 1;
    av_opt_set(ctx->priv_data, "preset", preset && preset[0] ? preset : "medium", 0);
    if (qp >= 0) {
        av_opt_set_int(ctx->priv_data, "qp", qp, 0);
    } else {
        av_opt_set_double(ctx->priv_data, "crf", crf, 0);
    }
    if (x264opts && x264opts[0])
        av_opt_set(ctx->priv_data, "x264-params", x264opts, 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVFrame *frame = av_frame_alloc();
    frame->format = AV_PIX_FMT_YUV420P;
    frame->width = w; frame->height = h;
    av_frame_get_buffer(frame, 0);
    AVPacket *pkt = av_packet_alloc();
    long out_pos = 0;
    long ysz = (long)w * h, csz = ysz / 4;
    int ret = 0;

    for (int f = 0; f <= n_frames; f++) {
        AVFrame *send = NULL;
        if (f < n_frames) {
            av_frame_make_writable(frame);
            const uint8_t *src = yuv + (long)f * (ysz + 2 * csz);
            for (int i = 0; i < h; i++)
                memcpy(frame->data[0] + (long)i * frame->linesize[0], src + (long)i * w, w);
            src += ysz;
            for (int p = 1; p <= 2; p++) {
                for (int i = 0; i < h / 2; i++)
                    memcpy(frame->data[p] + (long)i * frame->linesize[p], src + (long)i * (w/2), w/2);
                src += csz;
            }
            frame->pts = f;
            send = frame;
        }
        if (avcodec_send_frame(ctx, send) < 0) { ret = -4; break; }
        while (1) {
            int r = avcodec_receive_packet(ctx, pkt);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
            if (r < 0) { ret = -5; goto done; }
            if (out_pos + pkt->size > out_cap) { ret = -6; goto done; }
            memcpy(out + out_pos, pkt->data, pkt->size);
            out_pos += pkt->size;
            av_packet_unref(pkt);
        }
    }
done:
    /* prepend SPS/PPS if encoder used extradata (global header off by default
       for raw annexb, so usually already in-stream) */
    av_packet_free(&pkt);
    av_frame_free(&frame);
    avcodec_free_context(&ctx);
    return ret < 0 ? ret : out_pos;
}

/* ---- container validation (test-only): demux with libavformat and decode,
 * returning frames + stream metadata. ---- */
#include <libavformat/avformat.h>

int ffshim_decode_container(const char *path, uint8_t *out, long out_cap,
                            int *out_w, int *out_h,
                            double *out_duration, double *out_fps) {
    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, path, NULL, NULL) < 0) return -1;
    if (avformat_find_stream_info(fmt, NULL) < 0) { avformat_close_input(&fmt); return -2; }
    int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vs < 0) { avformat_close_input(&fmt); return -3; }
    AVStream *st = fmt->streams[vs];
    *out_duration = fmt->duration > 0 ? fmt->duration / (double)AV_TIME_BASE : 0.0;
    *out_fps = st->avg_frame_rate.den ? av_q2d(st->avg_frame_rate) : 0.0;

    const AVCodec *codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) { avformat_close_input(&fmt); return -4; }
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, st->codecpar);
    ctx->thread_count = 1;
    if (avcodec_open2(ctx, codec, NULL) < 0) {
        avcodec_free_context(&ctx); avformat_close_input(&fmt); return -5;
    }
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int n_frames = 0, ret = 0;
    long out_pos = 0;
    int eof = 0;
    while (!eof) {
        int r = av_read_frame(fmt, pkt);
        if (r < 0) { avcodec_send_packet(ctx, NULL); eof = 1; }
        else if (pkt->stream_index != vs) { av_packet_unref(pkt); continue; }
        else { avcodec_send_packet(ctx, pkt); av_packet_unref(pkt); }
        while (1) {
            r = avcodec_receive_frame(ctx, frame);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
            if (r < 0) { ret = -6; goto done; }
            int w = frame->width, h = frame->height;
            *out_w = w; *out_h = h;
            long need = (long)w * h * 3 / 2;
            if (out_pos + need > out_cap) { ret = -7; goto done; }
            for (int i = 0; i < h; i++)
                memcpy(out + out_pos + (long)i * w, frame->data[0] + (long)i * frame->linesize[0], w);
            out_pos += (long)w * h;
            for (int pl = 1; pl <= 2; pl++) {
                for (int i = 0; i < h / 2; i++)
                    memcpy(out + out_pos + (long)i * (w / 2),
                           frame->data[pl] + (long)i * frame->linesize[pl], w / 2);
                out_pos += (long)(w / 2) * (h / 2);
            }
            n_frames++;
        }
    }
done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return ret < 0 ? ret : n_frames;
}
