-- empty = pass: no routed row may violate its own admission rule,
-- and no 'unknown' (undecodable) payload may ever be admitted
SELECT doc_id
FROM media_routed
WHERE media_type = 'unknown'
   OR (media_type = 'video/mp4'
       AND (width = 0 OR width < height
            OR fps_milli < 5000 OR fps_milli > 120000))
   OR (media_type = 'image/webp'
       AND n_frames != 1
       AND NOT (is_animated = 1 AND duration_ms < 2000))
   OR (media_type = 'audio/mpeg' AND duration_ms < 2000)
