SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.Score>=6;
