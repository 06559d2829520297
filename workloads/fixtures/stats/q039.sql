SELECT COUNT(*) FROM posts as p, postHistory as ph, comments as c WHERE ph.PostId = p.Id AND c.PostId = p.Id AND p.Score=1 AND p.CommentCount>=9;
