-- Route media assets by headers-only metadata (no decoder has run):
-- keep landscape videos at a sane frame rate (width > 0 — an
-- audio-only .m4a routes as a dimensionless video/mp4 row and must
-- NOT slip through 0 >= 0; fps_milli 5000-120000 = 5-120 fps, from
-- the video TRACK's stts sample count over its mdhd media duration;
-- duration_ms is the elst PLAYED time when the track is edit-listed),
-- still WebP/GIF images plus animations under two seconds total
-- (frame count + summed per-frame durations), JPEG/PNG/BMP stills
-- between the 32px tracking-pixel floor and the 2048px ceiling on
-- both axes, and audio (MP3 or WAV) over two seconds — the
-- pre-decode admission rule of a multimodal pipeline.
SELECT doc_id, media_type, width, height, duration_ms, is_animated,
       n_frames, fps_milli
FROM media_metadata
WHERE (media_type = 'video/mp4' AND width > 0 AND width >= height
       AND fps_milli BETWEEN 5000 AND 120000)
   OR (media_type IN ('image/webp', 'image/gif')
       AND (n_frames = 1 OR (is_animated = 1 AND duration_ms < 2000)))
   OR (media_type IN ('image/jpeg', 'image/png', 'image/bmp')
       AND least(width, height) >= 32 AND greatest(width, height) <= 2048)
   OR (media_type IN ('audio/mpeg', 'audio/wav') AND duration_ms >= 2000)
